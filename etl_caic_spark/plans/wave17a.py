"""Round-12 wave B: span-extraction F1, distinct-n generation
diversity, McNemar paired test, Wald-Wolfowitz runs test, rank-SAX
symbolization, exponential-mechanism DP quantile.

- ``eval_span_f1``: exact-match span precision/recall/F1 (the NER /
  extraction eval) between gold spans (maximal runs of vowel-initial
  words in the first {_SPAN_WORDS} words of each doc) and predicted
  spans (the same labels with a deterministic md5 flip channel, 1/16
  per position). Spans are rebuilt with the gaps-and-islands idiom in
  both engines; P/R/F1 published as integer micro ratios.
- ``eval_distinct_ngrams``: Distinct-1 / Distinct-2 generation
  diversity per source (distinct n-grams over total n-grams) — the
  standard text-generation diversity metric, integer micro.
- ``stat_mcnemar``: McNemar's paired test over two deterministic
  md5-derived pseudo-classifiers of o_orderstatus = 'F' — full 2x2
  discordance table + continuity-corrected chi-square in integer
  micro (one integer round-half-up division, no float anywhere).
- ``stat_runs_test``: Wald-Wolfowitz runs test of the daily
  average-order-value series around its lower median (ties dropped,
  the classical treatment); runs counted with one lag over the
  bounded daily grid; z published in micro units with the same
  integer-numerator / one-float-chain discipline as
  stat_mann_kendall.
- ``ts_sax_symbolize``: rank-SAX symbolization of the daily series —
  PAA over {_SAX_W}-day segments (integer floor-division means), then
  quartile coding via ntile(4) to symbols 'a'..'d'. Value breakpoints
  are RANK-based (exact-integer, engine-identical) rather than the
  Gaussian breakpoints of classical SAX — documented deviation.
- ``priv_dp_quantile``: exponential-mechanism DP median over $1000
  order-value bins per order priority, with md5-seeded Gumbel-max
  selection (integer micro scores). NOT actual DP — same honest
  disclaimer and hash-seeded-noise discipline as
  priv_dp_noisy_counts: the determinism is what makes the mechanism
  PIPELINE (utility, Gumbel draw, argmax, post-processing)
  hash-verifiable against the DuckDB twin.

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate (LLM eval / drift / privacy frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.plans.wave16a import _DAILY_X_CTES, _spark_daily_x
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# eval_span_f1
# --------------------------------------------------------------------------

_SPAN_WORDS = 24  # label the first 24 words of each doc

# Gold label: word starts with a vowel. Predicted label: gold XOR a
# deterministic md5 flip (first nibble of md5('spanflip|doc:pos:word')
# = '0', i.e. 1/16 of positions). Spans = maximal runs of label=1.
_SPAN_CTES = f"""
    toks AS (
      SELECT source, doc_id, CAST(i AS INT) AS pos, ws[i + 1] AS w
      FROM (SELECT source, doc_id,
                   list_slice(string_split(text, ' '), 1, {_SPAN_WORDS}) AS ws
            FROM documents),
           unnest(range(len(ws))) t(i)
    ),
    lab AS (
      SELECT source, doc_id, pos,
             CASE WHEN substr(w, 1, 1) IN ('a','e','i','o','u')
                  THEN 1 ELSE 0 END AS gold,
             CASE WHEN substr(md5('spanflip|' || CAST(doc_id AS VARCHAR)
                        || ':' || CAST(pos AS VARCHAR) || ':' || w),
                        1, 1) = '0'
                  THEN 1 ELSE 0 END AS flip
      FROM toks
    ),
    lab2 AS (
      SELECT source, doc_id, pos, gold,
             CASE WHEN flip = 1 THEN 1 - gold ELSE gold END AS pred
      FROM lab
    ),
    gold_spans AS (
      SELECT source, doc_id, CAST(min(pos) AS INT) AS s,
             CAST(max(pos) AS INT) AS e
      FROM (SELECT source, doc_id, pos,
                   pos - row_number() OVER (
                     PARTITION BY doc_id ORDER BY pos) AS gid
            FROM lab2 WHERE gold = 1)
      GROUP BY source, doc_id, gid
    ),
    pred_spans AS (
      SELECT source, doc_id, CAST(min(pos) AS INT) AS s,
             CAST(max(pos) AS INT) AS e
      FROM (SELECT source, doc_id, pos,
                   pos - row_number() OVER (
                     PARTITION BY doc_id ORDER BY pos) AS gid
            FROM lab2 WHERE pred = 1)
      GROUP BY source, doc_id, gid
    ),
    joined AS (
      SELECT coalesce(g.source, p.source) AS source,
             CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_gold,
             CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_pred
      FROM gold_spans g
      FULL OUTER JOIN pred_spans p
        ON g.source = p.source AND g.doc_id = p.doc_id
       AND g.s = p.s AND g.e = p.e
    )
"""

_SPAN_F1_SQL = f"""
    WITH {_SPAN_CTES}
    SELECT source,
           CAST(sum(in_gold) AS BIGINT) AS n_gold,
           CAST(sum(in_pred) AS BIGINT) AS n_pred,
           CAST(sum(in_gold * in_pred) AS BIGINT) AS n_match,
           CAST(CASE WHEN sum(in_pred) > 0 THEN
                (2 * sum(in_gold * in_pred) * 1000000 + sum(in_pred))
                // (2 * sum(in_pred)) ELSE 0 END AS BIGINT) AS p_micro,
           CAST(CASE WHEN sum(in_gold) > 0 THEN
                (2 * sum(in_gold * in_pred) * 1000000 + sum(in_gold))
                // (2 * sum(in_gold)) ELSE 0 END AS BIGINT) AS r_micro,
           CAST((4 * sum(in_gold * in_pred) * 1000000
                 + sum(in_gold) + sum(in_pred))
                // (2 * (sum(in_gold) + sum(in_pred))) AS BIGINT) AS f1_micro
    FROM joined GROUP BY 1
"""


def _span_frames(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(gold_spans, pred_spans) mirroring _SPAN_CTES."""
    toks = d.select(
        "source",
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, _SPAN_WORDS)).alias(
            "pos", "w"
        ),
    )
    gold = F.substring("w", 1, 1).isin("a", "e", "i", "o", "u").cast("int")
    flip = (
        F.substring(
            F.md5(
                F.concat_ws(
                    "",
                    F.lit("spanflip|"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                    F.lit(":"),
                    F.col("w"),
                )
            ),
            1,
            1,
        )
        == "0"
    ).cast("int")
    lab = toks.select(
        "source",
        "doc_id",
        "pos",
        gold.alias("gold"),
        F.when(flip == 1, 1 - gold).otherwise(gold).alias("pred"),
    )

    def spans(col: str) -> DataFrame:
        # gaps-and-islands per doc — the window is bounded by the
        # _SPAN_WORDS cap (<= 24 rows per doc partition at any SF)
        w = Window.partitionBy("doc_id").orderBy("pos")
        return (
            lab.filter(F.col(col) == 1)
            .select(
                "source",
                "doc_id",
                "pos",
                (F.col("pos") - F.row_number().over(w)).alias("gid"),
            )
            .groupBy("source", "doc_id", "gid")
            .agg(
                F.min("pos").cast("int").alias("s"),
                F.max("pos").cast("int").alias("e"),
            )
        )

    return spans("gold"), spans("pred")


@register("eval_span_f1", oracle=_SPAN_F1_SQL, tags=("eval", "text", "llm"))
def eval_span_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match span P/R/F1 per source (the NER / extraction eval):
    gold spans are maximal runs of vowel-initial words in the first
    {_SPAN_WORDS} words; predicted spans come from the same labels
    through a deterministic md5 flip channel (1/16 per position). Both
    span sets are rebuilt with the gaps-and-islands idiom (pos minus
    row_number), matched with ONE full outer join on (source, doc,
    start, end), and all three counts come out of a single aggregate —
    the single-job assembly shape from the r12 eval_minhash_quality
    root-cause (each expensive leg feeds exactly one plan subtree).
    P/R/F1 are integer micro round-half-up divisions; F1 simplifies to
    2m/(g+p) so it needs no float either.

    Plan: one doc scan -> posexplode -> two filtered island groupBys
    (windows bounded by the 24-word cap per doc partition), one
    doc-grain full outer join, one source rollup. At 100 TB everything
    shuffles on doc_id until the final tiny source aggregate."""
    d = load_table(spark, sf_dir, "documents")
    gold_spans, pred_spans = _span_frames(d)
    g, p = gold_spans.alias("g"), pred_spans.alias("p")
    joined = g.join(
        p,
        (F.col("g.source") == F.col("p.source"))
        & (F.col("g.doc_id") == F.col("p.doc_id"))
        & (F.col("g.s") == F.col("p.s"))
        & (F.col("g.e") == F.col("p.e")),
        "full_outer",
    ).select(
        F.coalesce("g.source", "p.source").alias("source"),
        F.col("g.doc_id").isNotNull().cast("int").alias("in_gold"),
        F.col("p.doc_id").isNotNull().cast("int").alias("in_pred"),
    )
    return joined.groupBy("source").agg(
        F.sum("in_gold").cast("bigint").alias("n_gold"),
        F.sum("in_pred").cast("bigint").alias("n_pred"),
        F.sum(F.col("in_gold") * F.col("in_pred"))
        .cast("bigint")
        .alias("n_match"),
        F.expr(
            "CASE WHEN sum(in_pred) > 0 THEN"
            " (2 * sum(in_gold * in_pred) * 1000000 + sum(in_pred))"
            " div (2 * sum(in_pred)) ELSE 0 END"
        )
        .cast("bigint")
        .alias("p_micro"),
        F.expr(
            "CASE WHEN sum(in_gold) > 0 THEN"
            " (2 * sum(in_gold * in_pred) * 1000000 + sum(in_gold))"
            " div (2 * sum(in_gold)) ELSE 0 END"
        )
        .cast("bigint")
        .alias("r_micro"),
        F.expr(
            "(4 * sum(in_gold * in_pred) * 1000000"
            " + sum(in_gold) + sum(in_pred))"
            " div (2 * (sum(in_gold) + sum(in_pred)))"
        )
        .cast("bigint")
        .alias("f1_micro"),
    )


# --------------------------------------------------------------------------
# eval_distinct_ngrams
# --------------------------------------------------------------------------

_DISTINCT_N_SQL = """
    WITH ws AS (
      SELECT source, list_filter(string_split(text, ' '), w -> len(w) > 0)
               AS ws
      FROM documents
    ),
    grams AS (
      SELECT source, 'u' AS kind, ws[i + 1] AS gram
      FROM ws, unnest(range(len(ws))) t(i)
      UNION ALL
      SELECT source, 'b' AS kind, ws[i + 1] || ' ' || ws[i + 2] AS gram
      FROM ws, unnest(range(len(ws) - 1)) t(i)
    )
    SELECT source,
           CAST(count(*) FILTER (WHERE kind = 'u') AS BIGINT) AS n_unigrams,
           CAST(count(DISTINCT CASE WHEN kind = 'u' THEN gram END)
                AS BIGINT) AS d_unigrams,
           CAST((2 * count(DISTINCT CASE WHEN kind = 'u' THEN gram END)
                   * 1000000 + count(*) FILTER (WHERE kind = 'u'))
                // (2 * count(*) FILTER (WHERE kind = 'u'))
                AS BIGINT) AS distinct1_micro,
           CAST(count(*) FILTER (WHERE kind = 'b') AS BIGINT) AS n_bigrams,
           CAST(count(DISTINCT CASE WHEN kind = 'b' THEN gram END)
                AS BIGINT) AS d_bigrams,
           CAST((2 * count(DISTINCT CASE WHEN kind = 'b' THEN gram END)
                   * 1000000 + count(*) FILTER (WHERE kind = 'b'))
                // (2 * count(*) FILTER (WHERE kind = 'b'))
                AS BIGINT) AS distinct2_micro
    FROM grams GROUP BY 1
"""


@register(
    "eval_distinct_ngrams",
    oracle=_DISTINCT_N_SQL,
    tags=("eval", "text", "llm"),
)
def eval_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / Distinct-2 generation-diversity per source: the
    share of distinct unigrams / bigrams over total n-gram counts (the
    standard degeneracy metric for LLM sampling output), as integer
    micro round-half-up divisions.

    Plan: ONE doc scan builds both gram kinds from the same split array
    (unigrams via transform, bigrams via a sequence-indexed transform),
    concatenated and exploded once, then a single source-grain
    aggregate with conditional count / count-distinct. The two
    count(DISTINCT CASE ...) legs expand to one extra shuffle each
    (expand + partial agg — map-side combinable); at 100 TB the gram
    stream shuffles on (source, gram) with vocabulary-grain reducers,
    the same class as agg_heavy_hitters_exact's counts frame."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.select(
            "source",
            F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias(
                "ws"
            ),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "concat("
                    " transform(ws,"
                    "   w -> named_struct('kind', 'u', 'gram', w)),"
                    " transform("
                    "   zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                    "            slice(ws, 2, greatest(size(ws) - 1, 0)),"
                    "            (x, y) -> concat(x, ' ', y)),"
                    "   g -> named_struct('kind', 'b', 'gram', g)))"
                )
            ).alias("g"),
        )
        .select(
            "source",
            F.col("g.kind").alias("kind"),
            F.col("g.gram").alias("gram"),
        )
    )
    u = F.col("kind") == "u"
    b = F.col("kind") == "b"
    return grams.groupBy("source").agg(
        F.sum(u.cast("int")).cast("bigint").alias("n_unigrams"),
        F.count_distinct(F.when(u, F.col("gram")))
        .cast("bigint")
        .alias("d_unigrams"),
        F.expr(
            "(2 * count(DISTINCT CASE WHEN kind = 'u' THEN gram END)"
            " * 1000000 + sum(CASE WHEN kind = 'u' THEN 1 ELSE 0 END))"
            " div (2 * sum(CASE WHEN kind = 'u' THEN 1 ELSE 0 END))"
        )
        .cast("bigint")
        .alias("distinct1_micro"),
        F.sum(b.cast("int")).cast("bigint").alias("n_bigrams"),
        F.count_distinct(F.when(b, F.col("gram")))
        .cast("bigint")
        .alias("d_bigrams"),
        F.expr(
            "(2 * count(DISTINCT CASE WHEN kind = 'b' THEN gram END)"
            " * 1000000 + sum(CASE WHEN kind = 'b' THEN 1 ELSE 0 END))"
            " div (2 * sum(CASE WHEN kind = 'b' THEN 1 ELSE 0 END))"
        )
        .cast("bigint")
        .alias("distinct2_micro"),
    )


# --------------------------------------------------------------------------
# stat_mcnemar
# --------------------------------------------------------------------------

_MCN_SQL = """
    WITH p AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS truth,
             CASE WHEN substr(md5('mcn-A|' || CAST(o_orderkey AS VARCHAR)),
                         1, 1) < '8' THEN 1 ELSE 0 END AS pred_a,
             CASE WHEN substr(md5('mcn-B|' || CAST(o_orderkey AS VARCHAR)),
                         1, 1) < '6' THEN 1 ELSE 0 END AS pred_b
      FROM orders
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pred_a = truth AND pred_b = truth
                           THEN 1 ELSE 0 END) AS BIGINT) AS both_correct,
             CAST(sum(CASE WHEN pred_a = truth AND pred_b <> truth
                           THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
             CAST(sum(CASE WHEN pred_a <> truth AND pred_b = truth
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
             CAST(sum(CASE WHEN pred_a <> truth AND pred_b <> truth
                           THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
      FROM p
    )
    SELECT n, both_correct, a_only, b_only, both_wrong,
           CASE WHEN a_only + b_only > 0
                THEN CAST((2 * (abs(a_only - b_only) - 1)
                             * (abs(a_only - b_only) - 1) * 1000000
                           + a_only + b_only)
                          // (2 * (a_only + b_only)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS chi2_micro
    FROM c
"""


@register("stat_mcnemar", oracle=_MCN_SQL, tags=("stat", "eval"))
def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test over two deterministic md5-derived
    pseudo-classifiers of o_orderstatus = 'F' (A fires on hex nibble
    < '8' = 1/2 rate, B on < '6' = 3/8 rate — different
    operating points guarantee discordant pairs). Publishes the full
    2x2 correctness table and the continuity-corrected statistic
    (|b-c|-1)^2 / (b+c) as ONE integer round-half-up division — no
    float anywhere.

    Plan: one fact scan, pure scalar codegen, one partial-aggregatable
    one-row reduce. At 100 TB this is a single map-side-combined pass."""
    o = load_table(spark, sf_dir, "orders")
    truth = (F.col("o_orderstatus") == "F").cast("int")
    nib = lambda seed, lim: (  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col("o_orderkey").cast("string"))),
            1,
            1,
        )
        < lim
    ).cast("int")
    p = o.select(
        truth.alias("truth"),
        nib("mcn-A|", "8").alias("pred_a"),
        nib("mcn-B|", "6").alias("pred_b"),
    )
    c = p.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            ((F.col("pred_a") == F.col("truth"))
             & (F.col("pred_b") == F.col("truth"))).cast("int")
        )
        .cast("bigint")
        .alias("both_correct"),
        F.sum(
            ((F.col("pred_a") == F.col("truth"))
             & (F.col("pred_b") != F.col("truth"))).cast("int")
        )
        .cast("bigint")
        .alias("a_only"),
        F.sum(
            ((F.col("pred_a") != F.col("truth"))
             & (F.col("pred_b") == F.col("truth"))).cast("int")
        )
        .cast("bigint")
        .alias("b_only"),
        F.sum(
            ((F.col("pred_a") != F.col("truth"))
             & (F.col("pred_b") != F.col("truth"))).cast("int")
        )
        .cast("bigint")
        .alias("both_wrong"),
    )
    return c.select(
        "n",
        "both_correct",
        "a_only",
        "b_only",
        "both_wrong",
        F.when(
            F.col("a_only") + F.col("b_only") > 0,
            F.expr(
                "(2 * (abs(a_only - b_only) - 1)"
                " * (abs(a_only - b_only) - 1) * 1000000"
                " + a_only + b_only) div (2 * (a_only + b_only))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("chi2_micro"),
    )


# --------------------------------------------------------------------------
# stat_runs_test
# --------------------------------------------------------------------------

_RUNS_SQL = f"""
    WITH {_DAILY_X_CTES},
    med AS (
      SELECT x AS med FROM (
        SELECT x, row_number() OVER (ORDER BY x, day) AS rn,
               count(*) OVER () AS n
        FROM x) WHERE rn = (n + 1) // 2
    ),
    signs AS (
      SELECT day, CASE WHEN x.x > med THEN 1 ELSE 0 END AS s
      FROM x, med WHERE x.x <> med
    ),
    flips AS (
      SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY day)
                     THEN 1 ELSE 0 END AS f
      FROM signs
    ),
    runs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keep,
             CAST(sum(s) AS BIGINT) AS n_above,
             CAST(count(*) - sum(s) AS BIGINT) AS n_below,
             CAST(1 + sum(f) AS BIGINT) AS n_runs
      FROM flips
    )
    SELECT n_keep, n_above, n_below, n_runs,
           CASE WHEN n_above > 0 AND n_below > 0
                     AND 2 * n_above * n_below > n_keep
                THEN CAST(round(
                       (n_runs * n_keep - n_keep - 2 * n_above * n_below)
                       * 1000000.0
                       / sqrt(2.0 * n_above * n_below
                              * (2 * n_above * n_below - n_keep)
                              / (n_keep - 1.0))) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS z_micro
    FROM runs
"""


@register("stat_runs_test", oracle=_RUNS_SQL, tags=("stat", "ts"))
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the daily average-order-value series
    around its lower median (row at rank (n+1)//2 under the
    deterministic (x, day) order; days equal to the median are dropped
    — the classical treatment). Runs counted with one lag over the day
    order; z = (R - mu)/sigma algebraically rearranged to an INTEGER
    numerator R*n - n - 2ab over one float sqrt/divide/round chain (the
    same engine-identical discipline as stat_mann_kendall's z).

    All windows are over the daily grid — the documented bounded-domain
    class (~2.4k rows at any fact scale); the fact-grain work is the
    one daily rollup groupBy. The grid frame is localCheckpoint'd:
    three legs (median rank, sign filter, count) would otherwise each
    re-run the fact groupBy."""
    xf = _spark_daily_x(spark, sf_dir).localCheckpoint()
    w = Window.orderBy("x", "day")  # bounded-domain: daily grid
    ranked = xf.select(
        "day",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(F.col("x").alias("med"))
    signs = (
        xf.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("day", (F.col("x") > F.col("med")).cast("int").alias("s"))
    )
    wd = Window.orderBy("day")  # bounded-domain: daily grid
    flips = signs.select(
        "s",
        F.when(F.col("s") != F.lag("s").over(wd), 1).otherwise(0).alias("f"),
    )
    runs = flips.agg(
        F.count("*").cast("bigint").alias("n_keep"),
        F.sum("s").cast("bigint").alias("n_above"),
        (F.count("*") - F.sum("s")).cast("bigint").alias("n_below"),
        (1 + F.sum("f")).cast("bigint").alias("n_runs"),
    )
    ok = (
        (F.col("n_above") > 0)
        & (F.col("n_below") > 0)
        & (2 * F.col("n_above") * F.col("n_below") > F.col("n_keep"))
    )
    num = (
        F.col("n_runs") * F.col("n_keep")
        - F.col("n_keep")
        - 2 * F.col("n_above") * F.col("n_below")
    )
    sig = F.sqrt(
        2.0
        * F.col("n_above")
        * F.col("n_below")
        * (2 * F.col("n_above") * F.col("n_below") - F.col("n_keep"))
        / (F.col("n_keep") - 1.0)
    )
    return runs.select(
        "n_keep",
        "n_above",
        "n_below",
        "n_runs",
        F.when(ok, F.round(num * 1000000.0 / sig).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("z_micro"),
    )


# --------------------------------------------------------------------------
# ts_sax_symbolize
# --------------------------------------------------------------------------

_SAX_W = 32  # days per PAA segment

_SAX_SQL = f"""
    WITH {_DAILY_X_CTES},
    seg AS (
      SELECT (t - 1) // {_SAX_W} AS seg,
             min(day) AS start_day,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) // count(*) AS BIGINT) AS mean_cents
      FROM x GROUP BY 1
    )
    SELECT CAST(seg AS BIGINT) AS seg, start_day, n_days, mean_cents,
           chr(CAST(96 + ntile(4) OVER (ORDER BY mean_cents, seg)
               AS INTEGER)) AS symbol
    FROM seg
"""


@register("ts_sax_symbolize", oracle=_SAX_SQL, tags=("ts",))
def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-SAX symbolization of the daily average-order-value series:
    PAA means over {_SAX_W}-day segments (integer floor division of
    cent sums — engine-identical), then quartile coding via ntile(4)
    over the deterministic (mean, seg) order to symbols 'a'..'d'.
    Deviation from classical SAX pinned: breakpoints are RANK-based
    (exact integer, no Gaussian assumption) rather than N(0,1)
    quantiles — the symbol alphabet and downstream use (motif/discord
    mining on the symbol string) are unchanged.

    The segment grid is date-span bounded (~75 segments at any fact
    scale) — the documented bounded-domain window class; the
    fact-grain work is the one daily rollup groupBy inside
    _spark_daily_x. Plan: fact groupBy -> ~2.4k-row grid -> ~75-row
    segment groupBy -> one ntile window."""
    xf = _spark_daily_x(spark, sf_dir)
    seg = (
        xf.groupBy(F.expr(f"(t - 1) div {_SAX_W}").alias("seg"))
        .agg(
            F.min("day").alias("start_day"),
            F.count("*").cast("bigint").alias("n_days"),
            F.expr("sum(x) div count(*)").cast("bigint").alias("mean_cents"),
        )
    )
    w = Window.orderBy("mean_cents", "seg")  # bounded-domain: segment grid
    return seg.select(
        F.col("seg").cast("bigint").alias("seg"),
        "start_day",
        "n_days",
        "mean_cents",
        F.ntile(4).over(w).alias("q"),
    ).select(
        "seg",
        "start_day",
        "n_days",
        "mean_cents",
        F.expr("char(96 + q)").alias("symbol"),
    )


# --------------------------------------------------------------------------
# priv_dp_quantile
# --------------------------------------------------------------------------

_DPQ_BIN = 100_000  # $1000 bins, integer cents

_DPQ_SQL = f"""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) // {_DPQ_BIN} AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, bin, cnt,
             CAST(coalesce(sum(cnt) OVER (
               PARTITION BY grp ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_lt,
             CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM b
    ),
    scored AS (
      SELECT grp, bin, cnt, cnt_lt, n,
             -abs(2 * cnt_lt + cnt - n) AS u,
             CAST(round(-ln(-ln(
               (CAST(('0x' || substr(md5('dpq-seed-v1|' || grp || '|'
                      || CAST(bin AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0)) * 1000000) AS BIGINT) AS gumbel_micro
      FROM cum
    ),
    chosen AS (
      SELECT grp, bin AS dp_bin, u AS dp_utility, n
      FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY grp
        ORDER BY u * 500000 + gumbel_micro DESC, bin) = 1
    ),
    exact AS (
      SELECT grp, min(bin) AS exact_bin
      FROM cum WHERE 2 * (cnt_lt + cnt) >= n + 1 GROUP BY 1
    )
    SELECT c.grp, c.n, c.dp_bin, CAST(c.dp_utility AS BIGINT) AS dp_utility,
           e.exact_bin
    FROM chosen c JOIN exact e USING (grp)
"""


@register("priv_dp_quantile", oracle=_DPQ_SQL, tags=("privacy",))
def priv_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-mechanism DP median over $1000 order-value bins per
    order priority: utility u(bin) = -|#below - #above| (integer),
    Gumbel-max selection with md5-seeded noise (score = u * eps/2 in
    micro + Gumbel micro, argmax per group with deterministic bin
    tiebreak), published next to the exact median bin.

    THIS IS NOT DIFFERENTIAL PRIVACY — same disclaimer and discipline
    as priv_dp_noisy_counts: the seed lives in the repo and hashes the
    released keys, so the noise is recomputable; the determinism is
    what makes the mechanism pipeline (utility, inverse-CDF Gumbel
    draw, argmax, post-processing) hash-verifiable against the DuckDB
    twin. A production deployment draws the seed from a secret salt
    and accounts epsilon. The only floats are the ln/ln/round Gumbel
    chain on exactly-representable integers — the accepted
    dp_noisy_counts class; scores compare as INTEGERS (micro), so the
    argmax cannot flip on a ulp.

    Plan: one fact groupBy to (grp, bin) — value-domain bounded
    (~600 bins x 5 groups at any SF, the histogram class); two bounded
    windows (cumulative + argmax rank); one broadcast-size join of the
    two one-row-per-group legs. At 100 TB only the binning groupBy
    touches data."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            f"cast(round(o_totalprice * 100) as bigint) div {_DPQ_BIN}"
        ).alias("bin"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = b.select(
        "grp",
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
        .cast("bigint")
        .alias("cnt_lt"),
        F.sum("cnt")
        .over(Window.partitionBy("grp"))
        .cast("bigint")
        .alias("n"),
    ).localCheckpoint()  # two consumers: scored argmax + exact-median leg
    unif = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dpq-seed-v1|"),
                        F.col("grp"),
                        F.lit("|"),
                        F.col("bin").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 0.5
    ) / 4294967296.0
    scored = cum.select(
        "grp",
        "bin",
        "n",
        (-F.abs(2 * F.col("cnt_lt") + F.col("cnt") - F.col("n"))).alias("u"),
        F.round(-F.log(-F.log(unif)) * 1000000).cast("bigint").alias(
            "gumbel_micro"
        ),
    )
    wmax = Window.partitionBy("grp").orderBy(
        (F.col("u") * 500000 + F.col("gumbel_micro")).desc(), "bin"
    )
    chosen = (
        scored.withColumn("rk", F.row_number().over(wmax))
        .filter(F.col("rk") == 1)
        .select(
            "grp",
            F.col("bin").alias("dp_bin"),
            F.col("u").cast("bigint").alias("dp_utility"),
            "n",
        )
    )
    exact = (
        cum.filter(2 * (F.col("cnt_lt") + F.col("cnt")) >= F.col("n") + 1)
        .groupBy("grp")
        .agg(F.min("bin").alias("exact_bin"))
    )
    return chosen.join(exact, "grp").select(
        "grp", "n", "dp_bin", "dp_utility", "exact_bin"
    )
