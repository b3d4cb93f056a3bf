"""Round-12 wave C: Kneser-Ney held-out perplexity, stratified dataset
split, re-identification risk profile, one-pass column profiling,
hash-Bernoulli sampling, term burstiness.

- ``eval_kn_perplexity``: interpolated Kneser-Ney bigram LM scored on
  the same md5 doc-level held-out protocol as eval_perplexity_heldout
  (which uses add-one smoothing) — the pair exhibits the smoothing
  upgrade end to end. The discount D = 3/4 is an exact rational, so
  the whole probability is ONE ratio of integers:
      p(w2|w1) = [max(4*c12 - 3, 0) * T + 3 * N1(w1) * Ncont(w2)]
                 / (4 * c1 * T)
  with c1/N1 context stats from the train bigram table, Ncont the
  continuation-type count, T the total bigram-type count; scoring uses
  the frozen micro-nat log (round(round(ln, 6) * 1e6)) of that ratio.
- ``data_stratified_split``: deterministic 80/10/10 train/val/test
  split, stratified per (source, lang) by the md5 portable draw with
  EXACT integer boundaries (train iff 10*rank <= 8*n, val iff
  10*rank <= 9*n) — proportions hold per stratum by construction.
- ``priv_uniqueness_risk``: k-anonymity risk PROFILE of the customer
  quasi-identifier (nation, segment, $1000 acctbal band): equivalence
  classes bucketed by size (1 / 2-5 / 6-10 / 11+), with record shares
  as integer micro — the measurement companion to priv_k_anonymity
  (which enforces a floor).
- ``dq_column_profile``: one-pass null/distinct/min/max profile of a
  fixed orders column list via stack to (column, value) long form —
  values canonicalized to strings (bigints, dates ISO, price as
  integer cents) so one schema profiles every column.
- ``sample_bernoulli_hash``: deterministic hash-Bernoulli p = 1/8
  row sample (md5 nibble in {0,1}) with per-priority realized rates
  and a sampled-sum estimate — the row-level twin of
  sample_fraction's seeded sampler, reproducible on any engine.
- ``text_burstiness``: variance-to-mean ratio (index of dispersion)
  of per-doc occurrence counts for each source's top-5 terms —
  burstiness distinguishes topical terms (clumped, VMR >> 1) from
  function words (uniform, VMR ~ 1). Zero-inflated mean/variance over
  ALL docs of the source; VMR published as one integer round-half-up
  division of (n*sumsq - sum^2) * 1e6 over (n * sum).

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate (LLM-pipeline eval / curation / privacy frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# eval_kn_perplexity
# --------------------------------------------------------------------------

_KN_SQL = """
    WITH split AS (
      SELECT doc_id, string_split(text, ' ') AS l,
             substr(md5('ppl-v1|' || CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('0', '1') AS is_test
      FROM documents
    ),
    train_bg AS (
      SELECT l[i] AS w1, l[i + 1] AS w2, CAST(count(*) AS BIGINT) AS cb
      FROM split, unnest(range(1, greatest(len(l), 1))) t(i)
      WHERE NOT is_test GROUP BY 1, 2
    ),
    ctx AS (
      SELECT w1, CAST(sum(cb) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1
      FROM train_bg GROUP BY 1
    ),
    cont AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM train_bg GROUP BY 1
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM train_bg),
    test_bg AS (
      SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      FROM split, unnest(range(1, greatest(len(l), 1))) t(i)
      WHERE is_test
    ),
    scored AS (
      SELECT s.doc_id,
             CAST(round(round(ln(
               CASE WHEN x.c1 IS NULL
                    THEN CAST(greatest(4 * coalesce(c.ncont, 0), 1) AS HUGEINT)
                    ELSE greatest(
                      CAST(greatest(4 * coalesce(b.cb, 0) - 3, 0) AS HUGEINT)
                        * tt.t
                      + 3 * CAST(x.n1 AS HUGEINT) * coalesce(c.ncont, 0), 1)
                    END
               / (4.0 * coalesce(x.c1, 1) * tt.t)), 6) * 1e6)
               AS BIGINT) AS lp_micro
      FROM test_bg s
      LEFT JOIN train_bg b ON b.w1 = s.w1 AND b.w2 = s.w2
      LEFT JOIN ctx x ON x.w1 = s.w1
      LEFT JOIN cont c ON c.w2 = s.w2
      CROSS JOIN tt
    )
    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_test_docs,
           CAST(count(*) AS BIGINT) AS n_test_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_micro,
           CAST(round(-sum(lp_micro) * 1.0 / count(*)) AS BIGINT)
             AS ppl_micronat_per_token
    FROM scored
"""


@register("eval_kn_perplexity", oracle=_KN_SQL, tags=("eval", "text", "llm"))
def eval_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity on the held-out split
    of eval_perplexity_heldout (same 'ppl-v1' md5 doc draw, same output
    schema — the two queries differ ONLY in smoothing, so their
    ppl_micronat_per_token columns are directly comparable and KN
    should win). D = 3/4 exactly, so p(w2|w1) is one ratio of
    integers (module docstring); unseen-context rows degrade to the
    continuation term and a numerator floor of 1 keeps the log finite
    (the documented OOV floor). Scoring uses the frozen micro-nat log.

    Plan: ONE train bigram-type table feeds everything — context stats
    (c1, N1+) and continuation stats (Ncont) are two bounded
    re-groupings of it, T is its count; the test stream left-joins
    model tables on w1/w2 (model-grain shuffle, the serving layout) and
    reduces once. The bigram table has 3 consumers across jobs, so it
    is localCheckpoint'd (multi-consumer-checkpoint discipline)."""
    d = load_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        F.split("text", " ").alias("l"),
        F.substring(
            F.md5(F.concat(F.lit("ppl-v1|"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
        .isin("0", "1")
        .alias("is_test"),
    )
    pairs = F.when(
        F.size("l") >= 2,
        F.expr(
            "transform(sequence(1, size(l) - 1),"
            " i -> struct(l[i - 1] AS w1, l[i] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    train_bg = (
        split.filter(~F.col("is_test"))
        .select(F.explode(pairs).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("cb"))
        .localCheckpoint()  # 4 consumers: ctx, cont, T, the test join
    )
    ctx = train_bg.groupBy("w1").agg(
        F.sum("cb").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("n1"),
    )
    cont = train_bg.groupBy("w2").agg(
        F.count("*").cast("bigint").alias("ncont")
    )
    tt = train_bg.agg(F.count("*").cast("bigint").alias("t"))
    test_bg = (
        split.filter(F.col("is_test"))
        .select("doc_id", F.explode(pairs).alias("pr"))
        .select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    )
    # unseen context (c1 null): pure continuation term ncont/T (num
    # 4*ncont over den 4*1*T); the OOV floor of 1 keeps the log finite.
    # The seen-context numerator multiplies counts by the bigram-TYPE
    # count T, which exceeds int64 at web-corpus scale (~1e10 types x
    # 4e10 counts) — the operands widen to decimal(38,0) BEFORE the
    # double division (r12 ADVICE; the stat_bartlett discipline), with
    # HUGEINT on the oracle side. Fixture values are identical: every
    # operand is exactly representable either way.
    num = F.when(
        F.col("c1").isNull(),
        F.greatest(4 * F.coalesce("ncont", F.lit(0)), F.lit(1)).cast(
            "decimal(38,0)"
        ),
    ).otherwise(
        F.greatest(
            F.greatest(4 * F.coalesce("cb", F.lit(0)) - 3, F.lit(0)).cast(
                "decimal(38,0)"
            )
            * F.col("t")
            + F.lit(3).cast("decimal(38,0)")
            * F.col("n1")
            * F.coalesce("ncont", F.lit(0)),
            F.lit(1).cast("decimal(38,0)"),
        )
    )
    den = 4.0 * F.coalesce("c1", F.lit(1)) * F.col("t")
    scored = (
        test_bg.join(train_bg, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            F.round(F.round(F.log(num.cast("double") / den), 6) * 1e6)
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    return scored.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_test_docs"),
        F.count("*").cast("bigint").alias("n_test_bigrams"),
        F.sum("lp_micro").cast("bigint").alias("logprob_micro"),
        F.round(-F.sum("lp_micro") * 1.0 / F.count("*"))
        .cast("bigint")
        .alias("ppl_micronat_per_token"),
    )


# --------------------------------------------------------------------------
# data_stratified_split
# --------------------------------------------------------------------------

_SPLIT_SQL = """
    WITH ranked AS (
      SELECT source, lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5('split-v1|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY source, lang) AS BIGINT) AS n
      FROM documents
    ),
    tagged AS (
      SELECT source, lang, n_tokens,
             CASE WHEN 10 * r <= 8 * n THEN 'train'
                  WHEN 10 * r <= 9 * n THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT source, lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY 1, 2, 3
"""


@register("data_stratified_split", oracle=_SPLIT_SQL, tags=("data", "llm"))
def data_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split stratified per
    (source, lang): docs ranked by the md5 portable draw inside each
    stratum, then EXACT integer boundaries (train iff 10r <= 8n, val
    iff 10r <= 9n) — every stratum's proportions are correct to within
    one doc by construction, unlike a Bernoulli split whose per-stratum
    realized rates drift. The hash draw makes the split stable under
    corpus growth ONLY within a frozen snapshot — re-ranking moves
    boundaries; production pins the snapshot id into the seed.

    Plan: one doc scan, rank + count windows partitioned at stratum
    grain (bounded by stratum size), one grouped rollup. At 100 TB the
    stratum windows are the one shuffle; a mega-stratum is the skew
    hazard and pre-shards via the same draw's first nibble."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.concat(F.lit("split-v1|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    wn = Window.partitionBy("source", "lang")
    ranked = d.select(
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.row_number().over(w).cast("bigint").alias("r"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    tagged = ranked.select(
        "source",
        "lang",
        "n_tokens",
        F.when(10 * F.col("r") <= 8 * F.col("n"), "train")
        .when(10 * F.col("r") <= 9 * F.col("n"), "val")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("source", "lang", "split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# priv_uniqueness_risk
# --------------------------------------------------------------------------

_RISK_SQL = """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
             CAST(count(*) AS BIGINT) AS k
      FROM customer GROUP BY 1, 2, 3
    ),
    bucketed AS (
      SELECT CASE WHEN k = 1 THEN '1_unique'
                  WHEN k <= 5 THEN '2_k2_5'
                  WHEN k <= 10 THEN '3_k6_10'
                  ELSE '4_k11_plus' END AS k_bucket,
             k
      FROM qi
    ),
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM qi)
    SELECT k_bucket,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k) AS BIGINT) AS n_records,
           CAST((2 * sum(k) * 1000000 + n) // (2 * n) AS BIGINT)
             AS record_share_micro
    FROM bucketed, tot
    GROUP BY 1, n
"""


@register("priv_uniqueness_risk", oracle=_RISK_SQL, tags=("privacy",))
def priv_uniqueness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk profile of the customer quasi-identifier
    (nation, market segment, $1000 account-balance band): equivalence
    classes bucketed by size k into 1 / 2-5 / 6-10 / 11+, publishing
    class counts, record counts, and each bucket's record share in
    integer micro. k=1 records are population-unique under this QI —
    the direct re-identification exposure that priv_k_anonymity's
    suppression floor removes; this query MEASURES what that floor
    would suppress.

    Plan: one fact groupBy to QI-class grain (value-domain bounded),
    one bucket rollup, a broadcast one-row total. At 100 TB only the
    QI groupBy touches data."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "cast(round(c_acctbal * 100) as bigint) div 100000"
        ).alias("bal_band"),
    ).agg(F.count("*").cast("bigint").alias("k"))
    bucketed = qi.select(
        F.when(F.col("k") == 1, "1_unique")
        .when(F.col("k") <= 5, "2_k2_5")
        .when(F.col("k") <= 10, "3_k6_10")
        .otherwise("4_k11_plus")
        .alias("k_bucket"),
        "k",
    )
    tot = qi.agg(F.sum("k").cast("bigint").alias("n"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("k_bucket", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("k").cast("bigint").alias("n_records"),
        )
        .select(
            "k_bucket",
            "n_classes",
            "n_records",
            F.expr("(2 * n_records * 1000000 + n) div (2 * n)")
            .cast("bigint")
            .alias("record_share_micro"),
        )
    )


# --------------------------------------------------------------------------
# dq_column_profile
# --------------------------------------------------------------------------

_PROFILE_SQL = """
    WITH bounded AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
      FROM orders
    ),
    tier1 AS (
      SELECT col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(v) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
             min(v) AS min_str,
             max(v) AS max_str
      FROM bounded GROUP BY 1
    ),
    pk AS (
      SELECT 'o_orderkey' AS col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
             CAST(count(o_orderkey) AS BIGINT) AS n_distinct,
             CAST(min(o_orderkey) AS VARCHAR) AS min_str,
             CAST(max(o_orderkey) AS VARCHAR) AS max_str
      FROM orders
    ),
    ck_groups AS (
      SELECT o_custkey AS v, count(*) AS cnt FROM orders GROUP BY 1
    ),
    ck AS (
      SELECT 'o_custkey' AS col,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(coalesce(sum(cnt) FILTER (WHERE v IS NULL), 0) AS BIGINT)
               AS n_nulls,
             CAST(count(v) AS BIGINT) AS n_distinct,
             CAST(min(v) AS VARCHAR) AS min_str,
             CAST(max(v) AS VARCHAR) AS max_str
      FROM ck_groups
    ),
    tp_groups AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, count(*) AS cnt
      FROM orders GROUP BY 1
    ),
    tp AS (
      SELECT 'o_totalprice_cents' AS col,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(coalesce(sum(cnt) FILTER (WHERE v IS NULL), 0) AS BIGINT)
               AS n_nulls,
             CAST(count(v) AS BIGINT) AS n_distinct,
             CAST(min(v) AS VARCHAR) AS min_str,
             CAST(max(v) AS VARCHAR) AS max_str
      FROM tp_groups
    )
    SELECT * FROM tier1
    UNION ALL SELECT * FROM pk
    UNION ALL SELECT * FROM ck
    UNION ALL SELECT * FROM tp
"""


@register("dq_column_profile", oracle=_PROFILE_SQL, tags=("dq",))
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier null/distinct/min/max profile of the orders contract
    columns — values canonicalized to strings (bigints verbatim, dates
    ISO, price as integer cents) so a single output schema profiles
    heterogeneous columns; min/max are LEXICOGRAPHIC on the canonical
    string for the stacked tier and numeric-then-cast for the typed
    tiers (identical digits for the non-negative bigints involved —
    use the typed dq_* checks for numeric range contracts).

    Tiering is the 100 TB design (r12 verdict: the previous single
    6-way stack + count(DISTINCT) profiled row-scale-unique columns at
    string value grain, and the Expand's hash state bent superlinear at
    the 100x probe — 5.2x time for 3.3x data):

    - tier 1 (bounded cardinality: status, priority, date): 3-way
      stack + two-phase exact distinct (count-only (col, v) groupBy,
      then the 3-group rollup) — value-grain state is O(domain), a few
      thousand entries regardless of row count, and the fact-grain
      pass keeps a fixed-width aggregate buffer (see inline comment).
    - tier 2 (row-scale, non-unique: custkey, price cents): one
      value-grain groupBy per column on the TYPED bigint — no 6x
      Expand multiplying rows, no string widening; map-side combine
      collapses repeats before the shuffle and AQE sizes the reducers.
      Distinct-count, nulls, and min/max all derive from the group
      frame in one pass.
    - tier 3 (contract-unique PK: o_orderkey): profiled FROM the key
      constraint — n_distinct = count(non-null values), a pure scalar
      map-side aggregate with NO value-grain state at all. The
      uniqueness that licenses the derivation is audited by
      dq_constraint_suite's `orders_orderkey_unique` rule
      (analytics2q.py); the oracle derives identically, so both
      engines agree even if a fixture ever drifted (the drift itself
      is the audit query's finding, not the profiler's).

    All four legs are independent stages under one union — Spark runs
    them concurrently within the single action; each leg's scan prunes
    to exactly the columns it profiles."""
    o = load_table(spark, sf_dir, "orders")
    bounded = o.select(
        F.expr(
            "stack(3,"
            " 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority,"
            " 'o_orderdate', cast(cast(o_orderdate as date) as string)"
            ") as (col, v)"
        )
    )
    # Two-phase on purpose: a direct groupBy(col).agg(min(v), max(v))
    # carries VAR-LENGTH string min/max in the aggregate buffer, which
    # kicks the whole 3x-stacked fact pass out of hash aggregation into
    # SortAggregate — measured 105 s vs 7 s at the 100x probe. The
    # (col, v)-grain pre-aggregate is count-only (fixed-width buffer,
    # hash agg + map-side combine all the way); the string min/max then
    # runs at bounded VALUE grain, not row grain.
    t1_groups = bounded.groupBy("col", "v").agg(F.count("*").alias("cnt"))
    tier1 = t1_groups.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count("v").cast("bigint").alias("n_distinct"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )

    pk = o.select(
        F.lit("o_orderkey").alias("col"),
        F.count("*").cast("bigint").alias("n_rows"),
        (F.count("*") - F.count("o_orderkey")).cast("bigint").alias("n_nulls"),
        # by PK contract (audited by dq_constraint_suite): distinct == non-null
        F.count("o_orderkey").cast("bigint").alias("n_distinct"),
        F.min("o_orderkey").cast("string").alias("min_str"),
        F.max("o_orderkey").cast("string").alias("max_str"),
    )

    def typed_leg(name: str, col) -> DataFrame:
        groups = o.select(col.alias("v")).groupBy("v").agg(
            F.count("*").alias("cnt")
        )
        return groups.select(
            F.lit(name).alias("col"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_nulls"),
            F.count("v").cast("bigint").alias("n_distinct"),
            F.min("v").cast("string").alias("min_str"),
            F.max("v").cast("string").alias("max_str"),
        )

    ck = typed_leg("o_custkey", F.col("o_custkey"))
    tp = typed_leg(
        "o_totalprice_cents",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
    )
    return tier1.unionByName(pk).unionByName(ck).unionByName(tp)


# --------------------------------------------------------------------------
# sample_bernoulli_hash
# --------------------------------------------------------------------------

_BERN_SQL = """
    WITH s AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             substr(md5('bern-v1|' || CAST(o_orderkey AS VARCHAR)), 1, 1)
               IN ('0', '1') AS keep
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_sampled,
           CAST((2 * count(*) FILTER (WHERE keep) * 1000000 + count(*))
                // (2 * count(*)) AS BIGINT) AS rate_micro,
           CAST(coalesce(sum(cents) FILTER (WHERE keep), 0) * 8 AS BIGINT)
             AS est_total_cents
    FROM s GROUP BY 1
"""


@register("sample_bernoulli_hash", oracle=_BERN_SQL, tags=("sampling",))
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-Bernoulli p = 1/8 row sample (first md5
    nibble of the keyed draw in {0,1}) with per-priority realized
    rates (integer micro) and the Horvitz-Thompson scaled sum estimate
    (x8, exact integer) next to the population count — reproducible on
    any engine, unlike engine-native rand() samplers. The row-level
    twin of sample_fraction.

    Plan: one fact scan, scalar codegen predicate, one
    map-side-combined rollup — sampling adds zero distributed cost."""
    o = load_table(spark, sf_dir, "orders")
    keep = F.substring(
        F.md5(F.concat(F.lit("bern-v1|"), F.col("o_orderkey").cast("string"))),
        1,
        1,
    ).isin("0", "1")
    s = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        keep.alias("keep"),
    )
    return s.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_sampled"),
        F.expr(
            "(2 * sum(case when keep then 1 else 0 end) * 1000000"
            " + count(*)) div (2 * count(*))"
        )
        .cast("bigint")
        .alias("rate_micro"),
        (
            F.coalesce(F.sum(F.when(F.col("keep"), F.col("cents"))), F.lit(0))
            * 8
        )
        .cast("bigint")
        .alias("est_total_cents"),
    )


# --------------------------------------------------------------------------
# text_burstiness
# --------------------------------------------------------------------------

_TOP_TERMS = 5

_BURST_SQL = f"""
    WITH nd AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    tc AS (
      SELECT source, doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE len(tok) > 0 GROUP BY 1, 2, 3
    ),
    term AS (
      SELECT source, tok,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(c * c) AS BIGINT) AS sumsq
      FROM tc GROUP BY 1, 2
    ),
    top AS (
      SELECT source, tok, total, sumsq
      FROM term
      QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY total DESC, tok) <= {_TOP_TERMS}
    )
    SELECT t.source, t.tok, t.total,
           CAST(((nd.n_docs * t.sumsq - t.total * t.total) * 2 * 1000000
                 + nd.n_docs * t.total)
                // (2 * nd.n_docs * t.total) AS BIGINT) AS vmr_micro
    FROM top t JOIN nd USING (source)
"""


@register("text_burstiness", oracle=_BURST_SQL, tags=("text", "llm"))
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of per-doc counts
    for each source's top-{_TOP_TERMS} terms, zero-inflated over ALL
    the source's docs: VMR = (n*sumsq - total^2) / (n*total) as one
    integer round-half-up division in micro units (population variance
    over hash-mean — docs without the term contribute zero to both
    sums, so only the per-doc count table is ever materialized).
    Bursty topical terms clump (VMR >> 1); function words spread
    (VMR ~ 1) — a standard corpus-linguistics signal for stopword vs
    content-word triage in curation pipelines.

    Plan: one token scan -> (source, doc, term) counts (map-side
    combinable) -> (source, term) moment rollup -> top-k window at
    source grain over the vocab-bounded term table -> broadcast-size
    join with the doc counts. At 100 TB the reducers are vocabulary-
    grain; the window never sees fact-grain rows."""
    d = load_table(spark, sf_dir, "documents")
    nd = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    tc = (
        d.select(
            "source",
            "doc_id",
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .groupBy("source", "doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    term = tc.groupBy("source", "tok").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("total"), "tok")
    top = (
        term.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_TERMS)
        .drop("rk")
    )
    return top.join(F.broadcast(nd), "source").select(
        "source",
        "tok",
        "total",
        F.expr(
            "((n_docs * sumsq - total * total) * 2 * 1000000"
            " + n_docs * total) div (2 * n_docs * total)"
        )
        .cast("bigint")
        .alias("vmr_micro"),
    )
