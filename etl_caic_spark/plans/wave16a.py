"""Round-12 wave A: corpus edit-distance eval (WER/CER), best-fit
sequence packing, Page-Hinkley drift, Mann-Kendall trend, exact heavy
hitters.

- ``eval_wer_corpus`` / ``eval_cer_corpus``: corpus-level word / char
  error rate of a deterministic md5-derived corruption channel against
  the reference text — the eval family's exact edit-distance pair (r11
  verdict ask #5; the only prior Levenshtein exhibit was
  dedup_fuzzy_levenshtein). The corruption (delete / substitute /
  duplicate-insert per word, 1/16 probability each, md5-bucketed) is
  reproducible on any engine. WER needs WORD-level edit distance,
  which neither engine ships: each (ref, hyp) pair's vocabulary (<= 48
  distinct words by construction) is ranked lexicographically per doc
  and encoded as single ASCII characters, so the engines' native
  character-level ``levenshtein`` computes the word-level distance
  exactly.
- ``data_pack_bestfit``: best-fit-decreasing sequence packing into
  fixed token-budget bins — the packing-EFFICIENCY twin of
  data_token_budget_pack's greedy prefix (r11 verdict ask #5). The
  Spark side runs the sequential BFD per source group in applyInPandas
  (packing is inherently order-dependent inside a group; groups pack
  independently in parallel); the oracle replays the identical
  algorithm as a DuckDB recursive CTE over bin-residual lists.
- ``stat_page_hinkley``: Page-Hinkley drift test over the daily
  average-order-value series — the sequential-alarm sibling of
  ts_changepoint_cusum (same bounded daily grid, same integer-exact
  discipline: running mean by floor division, alarms in integer
  cents).
- ``stat_mann_kendall``: exact Mann-Kendall trend test (S statistic
  over all day pairs, tie-corrected variance) on the same series.
- ``agg_heavy_hitters_exact``: exact phi-heavy-hitters over the
  documents token stream — the exact twin of sketch_countmin_freq's
  estimate on the SAME stream.

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate (LLM-pipeline eval/curation frontier).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# shared corruption channel for WER / CER
# --------------------------------------------------------------------------

_REF_WORDS = 24  # ref = first 24 words; bounds the per-pair vocabulary

# Per (doc, pos, word): h = md5(doc_id:pos:word); first hex nibble picks
# the edit: '0' -> delete, '1' -> substitute with 'sub'||h[2:4], '2' ->
# keep AND insert a duplicate after, else keep. ~3/16 corrupted words.
_CORRUPT_CTES = f"""
    sliced AS (
      SELECT source, doc_id,
             list_slice(string_split(text, ' '), 1, {_REF_WORDS}) AS ws
      FROM documents
    ),
    ref AS (
      SELECT source, doc_id, CAST(i AS INT) AS pos, ws[i + 1] AS w
      FROM sliced, unnest(range(len(ws))) t(i)
    ),
    tagged AS (
      SELECT source, doc_id, pos, w,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)
                 || ':' || w) AS h
      FROM ref
    ),
    hyp AS (
      SELECT source, doc_id, pos, CAST(0 AS INT) AS k,
             CASE WHEN substr(h, 1, 1) = '1'
                  THEN 'sub' || substr(h, 2, 2) ELSE w END AS w
      FROM tagged WHERE substr(h, 1, 1) <> '0'
      UNION ALL
      SELECT source, doc_id, pos, CAST(1 AS INT) AS k, w
      FROM tagged WHERE substr(h, 1, 1) = '2'
    )
"""


def _spark_ref_hyp(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ref, hyp) word-sequence frames mirroring _CORRUPT_CTES."""
    ref = d.select(
        "source",
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, _REF_WORDS)).alias(
            "pos", "w"
        ),
    )
    tagged = ref.withColumn(
        "h", F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"), F.col("w")))
    )
    b = F.substring("h", 1, 1)
    kept = tagged.filter(b != "0").select(
        "source",
        "doc_id",
        "pos",
        F.lit(0).cast("int").alias("k"),
        F.when(b == "1", F.concat(F.lit("sub"), F.substring("h", 2, 2)))
        .otherwise(F.col("w"))
        .alias("w"),
    )
    inserted = tagged.filter(b == "2").select(
        "source", "doc_id", "pos", F.lit(1).cast("int").alias("k"), "w"
    )
    return ref, kept.unionAll(inserted)


# --------------------------------------------------------------------------
# eval_wer_corpus
# --------------------------------------------------------------------------

_WER_SQL = f"""
    WITH {_CORRUPT_CTES},
    vocab AS (
      SELECT doc_id, w,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY w) AS INT) AS code
      FROM (SELECT DISTINCT doc_id, w FROM ref
            UNION SELECT DISTINCT doc_id, w FROM hyp)
    ),
    ref_enc AS (
      SELECT r.doc_id, min(r.source) AS source,
             string_agg(chr(64 + v.code), '' ORDER BY r.pos) AS enc
      FROM ref r JOIN vocab v ON v.doc_id = r.doc_id AND v.w = r.w
      GROUP BY r.doc_id
    ),
    hyp_enc AS (
      SELECT hy.doc_id,
             string_agg(chr(64 + v.code), '' ORDER BY hy.pos, hy.k) AS enc
      FROM hyp hy JOIN vocab v ON v.doc_id = hy.doc_id AND v.w = hy.w
      GROUP BY hy.doc_id
    ),
    per_doc AS (
      SELECT r.source, r.doc_id,
             CAST(len(r.enc) AS BIGINT) AS ref_words,
             CAST(levenshtein(r.enc, coalesce(h.enc, '')) AS BIGINT) AS edits
      FROM ref_enc r LEFT JOIN hyp_enc h USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ref_words) AS BIGINT) AS ref_words,
           CAST(sum(edits) AS BIGINT) AS word_edits,
           CAST((2 * sum(edits) * 1000000 + sum(ref_words))
                // (2 * sum(ref_words)) AS BIGINT) AS wer_micro
    FROM per_doc GROUP BY 1
"""


@register("eval_wer_corpus", oracle=_WER_SQL, tags=("eval", "text", "llm"))
def eval_wer_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word error rate per source: Levenshtein over WORD
    sequences between the reference (first {_REF_WORDS} words) and the
    md5-corrupted hypothesis. Word-level distance via per-pair
    character encoding: the pair's vocabulary is <= 2*{_REF_WORDS}
    distinct words by construction, ranked lexicographically per doc
    and mapped to chr(64+code) (ASCII 'A'..'p'), so the engines' native
    character levenshtein computes the word distance exactly. WER is
    published as one integer division (round-half-up identity
    (2a*1e6+b) div (2b) — no float anywhere).

    Plan: one doc scan -> posexplode (fact-grain, partition-parallel),
    vocab rank window partitioned BY DOC (bounded 48 rows/partition),
    two code joins, per-doc encode groupBys, a levenshtein select, one
    source-grain aggregate. At 100 TB everything shuffles on doc_id
    (uniform) until the final tiny source rollup; the O(len^2) DP is
    per-row CPU bounded by {_REF_WORDS}^2 cells."""
    d = load_table(spark, sf_dir, "documents")
    ref, hyp = _spark_ref_hyp(d)
    vocab = (
        ref.select("doc_id", "w")
        .union(hyp.select("doc_id", "w"))
        .distinct()
        .select(
            "doc_id",
            "w",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("w"))
            .cast("int")
            .alias("code"),
        )
    )
    code_char = F.expr("char(64 + code)").alias("c")
    ref_enc = (
        ref.join(vocab, ["doc_id", "w"])
        .select("doc_id", "source", "pos", code_char)
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, c)))"
                ", s -> s.c), '')"
            ).alias("ref_e"),
        )
    )
    hyp_enc = (
        hyp.join(vocab, ["doc_id", "w"])
        .select("doc_id", "pos", "k", code_char)
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, k, c))), s -> s.c), '')"
            ).alias("hyp_e")
        )
    )
    per_doc = ref_enc.join(hyp_enc, "doc_id", "left").select(
        "source",
        F.length("ref_e").cast("bigint").alias("ref_words"),
        F.levenshtein(F.col("ref_e"), F.coalesce("hyp_e", F.lit("")))
        .cast("bigint")
        .alias("edits"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ref_words").cast("bigint").alias("ref_words"),
        F.sum("edits").cast("bigint").alias("word_edits"),
        F.expr(
            "(2 * sum(edits) * 1000000 + sum(ref_words))"
            " div (2 * sum(ref_words))"
        )
        .cast("bigint")
        .alias("wer_micro"),
    )


# --------------------------------------------------------------------------
# eval_cer_corpus
# --------------------------------------------------------------------------

_CER_SQL = f"""
    WITH {_CORRUPT_CTES},
    ref_txt AS (
      SELECT source, doc_id, array_to_string(ws, ' ') AS txt FROM sliced
    ),
    hyp_txt AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY pos, k) AS txt
      FROM hyp GROUP BY 1
    ),
    per_doc AS (
      SELECT r.source,
             CAST(length(r.txt) AS BIGINT) AS ref_chars,
             CAST(levenshtein(r.txt, coalesce(h.txt, '')) AS BIGINT) AS edits
      FROM ref_txt r LEFT JOIN hyp_txt h USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ref_chars) AS BIGINT) AS ref_chars,
           CAST(sum(edits) AS BIGINT) AS char_edits,
           CAST((2 * sum(edits) * 1000000 + sum(ref_chars))
                // (2 * sum(ref_chars)) AS BIGINT) AS cer_micro
    FROM per_doc GROUP BY 1
"""


@register("eval_cer_corpus", oracle=_CER_SQL, tags=("eval", "text", "llm"))
def eval_cer_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus character error rate per source over the same md5
    corruption channel as eval_wer_corpus, but at character grain:
    native levenshtein on the raw reference/hypothesis texts. CER is
    one integer division (round-half-up identity) — no float anywhere.

    Plan: doc scan -> corruption explode -> per-doc re-assembly groupBy
    -> levenshtein select -> source rollup. The DP cost is bounded by
    the {_REF_WORDS}-word text cap (~600 chars); at 100 TB this is
    embarrassingly parallel per doc with one doc_id shuffle."""
    d = load_table(spark, sf_dir, "documents")
    _, hyp = _spark_ref_hyp(d)
    ref_txt = d.select(
        "source",
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, _REF_WORDS), " ").alias(
            "txt"
        ),
    )
    hyp_txt = hyp.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, k, w)))"
            ", s -> s.w), ' ')"
        ).alias("htxt")
    )
    per_doc = ref_txt.join(hyp_txt, "doc_id", "left").select(
        "source",
        F.length("txt").cast("bigint").alias("ref_chars"),
        F.levenshtein(F.col("txt"), F.coalesce("htxt", F.lit("")))
        .cast("bigint")
        .alias("edits"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ref_chars").cast("bigint").alias("ref_chars"),
        F.sum("edits").cast("bigint").alias("char_edits"),
        F.expr(
            "(2 * sum(edits) * 1000000 + sum(ref_chars))"
            " div (2 * sum(ref_chars))"
        )
        .cast("bigint")
        .alias("cer_micro"),
    )


# --------------------------------------------------------------------------
# data_pack_bestfit
# --------------------------------------------------------------------------

_PACK_CAP = 256  # tokens per bin; fixture docs are 10-99 tokens

_PACK_SQL = f"""
    WITH RECURSIVE toks AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      FROM documents
    ),
    items AS (
      SELECT source, doc_id, tokens,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY tokens DESC, doc_id)
               AS BIGINT) AS rn
      FROM toks
    ),
    pack AS (
      SELECT source, CAST(0 AS BIGINT) AS step, CAST([] AS BIGINT[]) AS bins
      FROM (SELECT DISTINCT source FROM items)
      UNION ALL
      SELECT p.source, p.step + 1,
             CASE WHEN list_min(list_filter(p.bins, b -> b >= i.tokens))
                       IS NULL
                  THEN list_append(p.bins, {_PACK_CAP} - i.tokens)
                  ELSE list_concat(list_concat(
                         p.bins[1:list_position(p.bins, list_min(
                           list_filter(p.bins, b -> b >= i.tokens))) - 1],
                         [list_min(list_filter(p.bins, b -> b >= i.tokens))
                          - i.tokens]),
                         p.bins[list_position(p.bins, list_min(
                           list_filter(p.bins, b -> b >= i.tokens))) + 1:])
             END
      FROM pack p JOIN items i ON i.source = p.source AND i.rn = p.step + 1
    ),
    final AS (
      SELECT source, bins FROM pack
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY step DESC) = 1
    ),
    sums AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(tokens) AS BIGINT) AS tokens_total
      FROM items GROUP BY 1
    )
    SELECT s.source, s.n_items, s.tokens_total,
           CAST(len(f.bins) AS BIGINT) AS n_bins,
           CAST((s.tokens_total + {_PACK_CAP} - 1) // {_PACK_CAP}
                AS BIGINT) AS lb_bins,
           CAST(len(f.bins) * {_PACK_CAP} - s.tokens_total
                AS BIGINT) AS waste_tokens,
           CAST((2 * s.tokens_total * 1000000 + len(f.bins) * {_PACK_CAP})
                // (2 * len(f.bins) * {_PACK_CAP})
                AS BIGINT) AS efficiency_micro
    FROM sums s JOIN final f USING (source)
"""

_PACK_SCHEMA = (
    "source string, n_items bigint, tokens_total bigint, n_bins bigint,"
    " lb_bins bigint, waste_tokens bigint, efficiency_micro bigint"
)


def _bfd_pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Best-fit decreasing within one source group. Items in (tokens
    desc, doc_id) order; each goes to the fullest bin that still fits
    (min residual >= tokens, lowest index on ties — the identical rule
    the oracle's list_position-of-list_min encodes); else a new bin."""
    pdf = pdf.sort_values(["tokens", "doc_id"], ascending=[False, True])
    bins: list[int] = []  # residual capacity per bin
    for t in pdf["tokens"]:
        t = int(t)
        if t > _PACK_CAP:
            raise ValueError(
                f"data_pack_bestfit: item of {t} tokens exceeds bin"
                f" capacity {_PACK_CAP}"
            )
        best_i = -1
        for i, r in enumerate(bins):
            if r >= t and (best_i < 0 or r < bins[best_i]):
                best_i = i
        if best_i < 0:
            bins.append(_PACK_CAP - t)
        else:
            bins[best_i] -= t
    total = int(pdf["tokens"].sum())
    n_bins = len(bins)
    cap_total = n_bins * _PACK_CAP
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "n_items": [len(pdf)],
            "tokens_total": [total],
            "n_bins": [n_bins],
            "lb_bins": [(total + _PACK_CAP - 1) // _PACK_CAP],
            "waste_tokens": [cap_total - total],
            # round-half-up without float: round(a/b) = (2a+b) // (2b)
            "efficiency_micro": [
                (2 * total * 1000000 + cap_total) // (2 * cap_total)
            ],
        }
    )


@register("data_pack_bestfit", oracle=_PACK_SQL, tags=("data", "llm"))
def data_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing into {_PACK_CAP}-token bins,
    per source — the packing-EFFICIENCY twin of data_token_budget_pack
    (which keeps a greedy budget prefix; this packs EVERYTHING and
    reports how tightly). Publishes bins used vs the ceil(total/cap)
    lower bound, waste, and efficiency (one integer round-half-up
    division).

    Packing is inherently sequential WITHIN a group (each placement
    depends on all prior placements), so the group loop runs in
    applyInPandas — one shuffle at source grain, groups pack
    independently in parallel, per-group state is just the bin-residual
    list (<= n_items ints). At 100 TB a mega-source is pre-split with
    data_rendezvous_shard's rendezvous assignment and each shard packs
    separately (bin packing is shard-additive up to one partial bin per
    shard — the standard distributed-packing tradeoff); the oracle
    replays the exact algorithm as a recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("tokens"),
    )
    return toks.groupBy("source").applyInPandas(_bfd_pack_group, _PACK_SCHEMA)


# --------------------------------------------------------------------------
# daily average-order-value series (shared by page_hinkley / mann_kendall)
# --------------------------------------------------------------------------

_DAILY_X_CTES = """
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    x AS (
      SELECT day, cents // n_orders AS x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM daily
    )
"""


def _spark_daily_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily average order value in integer cents (floor division —
    engine-identical on non-negative operands), with the day ordinal.
    The ORDER BY day window is over the DAILY grid — the documented
    bounded-domain window class (date-span capped, ~2.4k rows at any
    SF; same triage as ts_changepoint_cusum)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("day")  # bounded-domain: daily grid
    return daily.select(
        "day",
        F.expr("cents div n_orders").alias("x"),
        F.row_number().over(w).cast("bigint").alias("t"),
    )


# --------------------------------------------------------------------------
# stat_page_hinkley
# --------------------------------------------------------------------------

_PH_DELTA = 100_000  # tolerated drift per step, cents ($1k on ~$250k AOV)
_PH_LAMBDA = 50_000_000  # alarm threshold, cents

_PH_SQL = f"""
    WITH {_DAILY_X_CTES},
    cum AS (
      SELECT day, x, t, CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS sx
      FROM x
    ),
    dev AS (
      SELECT day, t, x - (sx // t) - {_PH_DELTA} AS d FROM cum
    ),
    m AS (
      SELECT day, t, CAST(sum(d) OVER (ORDER BY day) AS BIGINT) AS mt
      FROM dev
    ),
    ph AS (
      SELECT day, t, mt,
             mt - min(mt) OVER (ORDER BY day) AS pht
      FROM m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) FILTER (WHERE pht > {_PH_LAMBDA}) AS BIGINT)
             AS n_alarms,
           min(day) FILTER (WHERE pht > {_PH_LAMBDA}) AS first_alarm_day,
           CAST(max(pht) AS BIGINT) AS max_ph_cents
    FROM ph
"""


@register("stat_page_hinkley", oracle=_PH_SQL, tags=("stat", "ts"))
def stat_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detection on the daily average-order-value
    series: m_T = sum_t (x_t - mean_{1..t} - delta), alarm when
    m_T - min_{t<=T} m_t exceeds lambda — the sequential-alarm sibling
    of ts_changepoint_cusum (which finds the single best split
    offline). Integer-exact end to end: the running mean is a FLOOR
    division of cumulative cents (identical on both engines for
    non-negative operands); delta/lambda are integer cents; no float
    ever enters the statistic.

    The cumulations are ORDER BY day over the daily grid — the
    documented bounded-domain window class (~2.4k rows regardless of
    fact size). Plan: one fact groupBy to the grid, three stacked
    bounded windows, a one-row reduce. At 100 TB only the daily rollup
    touches data."""
    xf = _spark_daily_x(spark, sf_dir)
    w = Window.orderBy("day")
    cum = xf.select(
        "day",
        "x",
        "t",
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("sx"),
    )
    dev = cum.select(
        "day", "t", F.expr(f"x - (sx div t) - {_PH_DELTA}").alias("d")
    )
    m = dev.select(
        "day",
        "t",
        F.sum("d")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("mt"),
    )
    ph = m.select(
        "day",
        (
            F.col("mt")
            - F.min("mt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("pht"),
    )
    alarm = F.col("pht") > _PH_LAMBDA
    return ph.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(alarm.cast("int")).cast("bigint").alias("n_alarms"),
        F.min(F.when(alarm, F.col("day"))).alias("first_alarm_day"),
        F.max("pht").cast("bigint").alias("max_ph_cents"),
    )


# --------------------------------------------------------------------------
# stat_mann_kendall
# --------------------------------------------------------------------------

_MK_SQL = f"""
    WITH {_DAILY_X_CTES},
    s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM x a JOIN x b ON a.t < b.t
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM x),
    ties AS (
      SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM x GROUP BY x)
      WHERE c > 1
    )
    SELECT n_days, s_stat,
           CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                AS BIGINT) AS var18,
           CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5) - tie_term > 0
                THEN CAST(round(
                       (s_stat - CASE WHEN s_stat > 0 THEN 1
                                      WHEN s_stat < 0 THEN -1
                                      ELSE 0 END) * 1000000.0
                       / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)
                               - tie_term) / 18.0)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS z_micro
    FROM s, n, ties
"""


@register("stat_mann_kendall", oracle=_MK_SQL, tags=("stat", "ts"))
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Kendall trend test on the daily average-order-value
    series: S = sum over all day pairs of sign(x_j - x_i), tie-corrected
    variance 18*Var = n(n-1)(2n+5) - sum t(t-1)(2t+5), continuity-
    corrected z published in micro units (the only float ops are the
    final sqrt/divide/round — a fixed left-to-right scalar chain on
    exactly-representable integers, identical on both engines).

    The pair join is a range self-join ON THE DAILY GRID — the grid is
    date-span bounded (~2.4k rows at ANY fact scale, ~3M pairs), the
    same bounded-domain class as stat_kaplan_meier's window; the
    fact-scale work is only the daily rollup. The grid frame is
    localCheckpoint'd because three independent legs (pairs x2, ties,
    count) would otherwise each re-run the fact groupBy."""
    xf = _spark_daily_x(spark, sf_dir).localCheckpoint()
    a, b = xf.alias("a"), xf.alias("b")
    s = a.join(b, F.col("a.t") < F.col("b.t")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = xf.agg(F.count("*").cast("bigint").alias("n_days"))
    ties = (
        xf.groupBy("x")
        .agg(F.count("*").cast("bigint").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    sgn = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    return j.select(
        "n_days",
        "s_stat",
        var18.cast("bigint").alias("var18"),
        F.when(
            var18 > 0,
            F.round(
                (F.col("s_stat") - sgn)
                * 1000000.0
                / F.sqrt(var18 / 18.0)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("z_micro"),
    )


# --------------------------------------------------------------------------
# agg_heavy_hitters_exact
# --------------------------------------------------------------------------

_HH_PHI = 64  # heavy = frequency > N/64 of the token stream

_HH_SQL = f"""
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    t2 AS (SELECT tok FROM t WHERE len(tok) > 0),
    c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
    SELECT tok, cnt, total,
           CAST((2 * cnt * 1000000 + total) // (2 * total)
                AS BIGINT) AS share_micro
    FROM c, tot
    WHERE cnt * {_HH_PHI} > total
"""


@register(
    "agg_heavy_hitters_exact", oracle=_HH_SQL, tags=("agg", "sketch", "llm")
)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitters (count > N/{_HH_PHI}) over the documents
    token stream — the exact twin of sketch_countmin_freq's estimate on
    the SAME stream, so the two queries together exhibit the sketch's
    error bound end to end. Share published as one integer
    round-half-up division.

    Plan: ONE fact-grain token scan into a map-side-combinable groupBy
    at token grain; the counts frame is localCheckpoint'd because both
    the grand total and the threshold filter consume it (two cross-job
    consumers -> without materialization the token scan runs twice);
    the total then broadcasts back as a one-row frame. At 100 TB the
    counts frame is distinct-vocabulary grain (the same class as the
    sketch's counter table, but unbounded): if vocabulary explodes,
    countmin prefilters the candidate set and this exact pass runs only
    on the sketch's survivors."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.length("tok") > 0
    )
    counts = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_PHI > F.col("total"))
        .select(
            "tok",
            "cnt",
            "total",
            F.expr("(2 * cnt * 1000000 + total) div (2 * total)")
            .cast("bigint")
            .alias("share_micro"),
        )
    )
