"""Round-12 wave D: G-test, Bartlett variance homogeneity, minority
oversampling plan, per-source corpus datasheet.

- ``stat_g_test``: log-likelihood-ratio independence test over the
  (o_orderstatus x o_orderpriority) contingency table — the LR twin of
  stat_chi_square on the same table. Each cell's term
  2*O*ln(O*n / (row*col)) is the frozen micro-nat log of a ratio of
  integers (the eval_perplexity_heldout convention), summed exactly.
- ``stat_bartlett``: Bartlett's test for variance homogeneity of
  order-value cents across priorities: per-group integer moments
  (n, sum, sumsq) make every variance a ratio of integers; the
  statistic's ln terms use the frozen micro-nat log and the final
  scalar chain follows the stat_mann_kendall discipline.
- ``data_oversample_minority``: class-balance oversampling PLAN per
  language: integer replication factor ceil(max_count/count) per lang
  and the exact resulting sizes — the curation step that equalizes a
  skewed language mix before training (plan only: the factors table is
  what a downstream explode(sequence(1, factor)) consumes).
- ``corpus_datasheet``: the per-source dataset card in one pass —
  docs, exact-dup rate (md5 content hash), token counts, vocabulary,
  type-token ratio — the one-row-per-source summary a dataset
  datasheet quotes, all integer/micro exact.

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# stat_g_test
# --------------------------------------------------------------------------

_G_SQL = """
    WITH cell AS (
      SELECT o_orderstatus AS r, o_orderpriority AS c,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT r, CAST(sum(o) AS BIGINT) AS ro FROM cell GROUP BY 1),
    cols_ AS (SELECT c, CAST(sum(o) AS BIGINT) AS co FROM cell GROUP BY 1),
    n_ AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cell),
    terms AS (
      SELECT cell.o,
             CAST(round(round(ln(
               CAST(CAST(cell.o AS HUGEINT) * n_.n AS DOUBLE)
               / CAST(CAST(rows_.ro AS HUGEINT) * cols_.co AS DOUBLE)), 6)
               * 1e6) AS BIGINT) AS ln_micro
      FROM cell JOIN rows_ USING (r) JOIN cols_ USING (c) CROSS JOIN n_
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM rows_) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM cols_) AS n_cols,
           (SELECT n FROM n_) AS n,
           CAST(sum(2 * CAST(o AS HUGEINT) * ln_micro) AS BIGINT) AS g_micro
    FROM terms
"""


@register("stat_g_test", oracle=_G_SQL, tags=("stat",))
def stat_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood ratio) of independence over the
    (o_orderstatus x o_orderpriority) contingency table — the LR twin
    of stat_chi_square on the same table (G ~ chi2 asymptotically;
    the two statistics diverge on small expected counts, which is the
    point of publishing both). Each cell's ln(O*n/(row*col)) is a
    frozen micro-nat log of a ratio of integers; G_micro =
    sum(2*O*ln_micro) is then an EXACT integer sum — no float
    accumulation anywhere. The ratio operands O*n and row*col are
    formed in decimal(38,0)/HUGEINT BEFORE the double conversion (r12
    ADVICE: at n ~ 1.5e11 the bigint products exceed int64, where
    non-ANSI Spark wraps silently while DuckDB raises — the
    stat_bartlett sumsq discipline), and the term sum accumulates in
    the same wide type; only the published g_micro column is bigint
    (safe for any physically plausible table: G <= 2*n*ln(n)).

    Plan: one fact groupBy to the k*m cell grain, two bounded
    re-groupings for margins, broadcast n, one reduce. At 100 TB only
    the cell groupBy touches data (map-side combined)."""
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    rows_ = cell.groupBy("r").agg(F.sum("o").cast("bigint").alias("ro"))
    cols_ = cell.groupBy("c").agg(F.sum("o").cast("bigint").alias("co"))
    n_ = cell.agg(F.sum("o").cast("bigint").alias("n"))
    nr = rows_.agg(F.count("*").cast("bigint").alias("n_rows"))
    nc = cols_.agg(F.count("*").cast("bigint").alias("n_cols"))
    terms = (
        cell.join(F.broadcast(rows_), "r")
        .join(F.broadcast(cols_), "c")
        .crossJoin(F.broadcast(n_))
        .select(
            "o",
            F.round(
                F.round(
                    F.log(
                        (F.col("o").cast("decimal(38,0)") * F.col("n"))
                        .cast("double")
                        / (F.col("ro").cast("decimal(38,0)") * F.col("co"))
                        .cast("double")
                    ),
                    6,
                )
                * 1e6
            )
            .cast("bigint")
            .alias("ln_micro"),
            "n",
        )
    )
    g = terms.groupBy("n").agg(
        F.sum(
            F.lit(2).cast("decimal(38,0)")
            * F.col("o")
            * F.col("ln_micro")
        )
        .cast("bigint")
        .alias("g_micro")
    )
    return (
        F.broadcast(nr)
        .crossJoin(F.broadcast(nc))
        .crossJoin(g)
        .select("n_rows", "n_cols", "n", "g_micro")
    )


# --------------------------------------------------------------------------
# stat_bartlett
# --------------------------------------------------------------------------

_BARTLETT_SQL = """
    WITH g0 AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               AS s,
             CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                      * CAST(round(o_totalprice * 100) AS HUGEINT))
                  AS DOUBLE) AS ss
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT grp, n, (ss - s * s / n) AS css FROM g0
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(n - 1) AS BIGINT) AS df,
             sum(css) AS ssw,
             sum(1.0 / (n - 1)) AS inv_sum
      FROM g
    ),
    terms AS (
      SELECT g.n, m.k, m.nt, m.df, m.inv_sum,
             CAST(round(round(ln(
               (g.css / (g.n - 1.0)) / (m.ssw / (1.0 * m.df))), 6) * 1e6)
               AS BIGINT) AS ln_micro
      FROM g CROSS JOIN m
    ),
    agg AS (
      SELECT k, nt, df, inv_sum,
             CAST(sum(-(n - 1) * ln_micro) AS BIGINT) AS bartlett_raw_micro
      FROM terms GROUP BY 1, 2, 3, 4
    )
    SELECT k, nt, bartlett_raw_micro,
           CAST(round(bartlett_raw_micro
             / (1.0 + (inv_sum - 1.0 / df) / (3.0 * (k - 1))))
             AS BIGINT) AS bartlett_micro
    FROM agg
"""


@register("stat_bartlett", oracle=_BARTLETT_SQL, tags=("stat",))
def stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of order-value variance across
    the five priorities. Group moments (n, sum cents, sum cents^2) are
    exact integers, so each sample variance and the pooled variance are
    ratios the engines compute identically; each group's
    ln(s_i^2 / s_p^2) is a frozen micro-nat log, making the
    uncorrected statistic -sum((n_i-1)*ln_micro) an EXACT integer. The
    Bartlett small-sample correction C = 1 + (sum 1/(n_i-1) - 1/df)
    / (3(k-1)) is the one float chain (MK discipline), published as a
    rounded division of the exact raw statistic.

    Plan: one fact groupBy to k=5 group moments, broadcast pooled
    scalars, bounded term table, one reduce."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # moments: s fits bigint; sum(cents^2) overflows int64 at sf>=0.1
    # (~5e20), so it accumulates in DECIMAL(38,0) — exact — and both
    # engines convert the SAME exact integer to double before any
    # float arithmetic (DuckDB sums HUGEINT products; identical value,
    # identical nearest-double)
    dec = "decimal(38,0)"
    g0 = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").cast("double").alias("s"),
        F.sum(cents.cast(dec) * cents.cast(dec))
        .cast(dec)
        .cast("double")
        .alias("ss"),
    )
    g = g0.select(
        "grp",
        "n",
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("css"),
    )
    m = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.col("n") - 1).cast("bigint").alias("df"),
        F.sum("css").alias("ssw"),
        F.sum(1.0 / (F.col("n") - 1)).alias("inv_sum"),
    )
    terms = g.crossJoin(F.broadcast(m)).select(
        "n",
        "k",
        "nt",
        "df",
        "inv_sum",
        F.round(
            F.round(
                F.log(
                    (F.col("css") / (F.col("n") - 1.0))
                    / (F.col("ssw") / (1.0 * F.col("df")))
                ),
                6,
            )
            * 1e6
        )
        .cast("bigint")
        .alias("ln_micro"),
    )
    return terms.groupBy("k", "nt", "df", "inv_sum").agg(
        F.sum(-(F.col("n") - 1) * F.col("ln_micro"))
        .cast("bigint")
        .alias("bartlett_raw_micro"),
    ).select(
        "k",
        "nt",
        "bartlett_raw_micro",
        F.round(
            F.col("bartlett_raw_micro")
            / (
                1.0
                + (F.col("inv_sum") - 1.0 / F.col("df"))
                / (3.0 * (F.col("k") - 1))
            )
        )
        .cast("bigint")
        .alias("bartlett_micro"),
    )


# --------------------------------------------------------------------------
# data_oversample_minority
# --------------------------------------------------------------------------

_OVERSAMPLE_SQL = """
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    mx AS (SELECT CAST(max(n_docs) AS BIGINT) AS mx FROM c)
    SELECT lang, n_docs, n_tokens,
           CAST((mx + n_docs - 1) // n_docs AS BIGINT) AS rep_factor,
           CAST(((mx + n_docs - 1) // n_docs) * n_docs AS BIGINT)
             AS resampled_docs,
           CAST(((mx + n_docs - 1) // n_docs) * n_tokens AS BIGINT)
             AS resampled_tokens
    FROM c, mx
"""


@register(
    "data_oversample_minority", oracle=_OVERSAMPLE_SQL, tags=("data", "llm")
)
def data_oversample_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance oversampling PLAN per language: integer
    replication factor ceil(max_lang_docs / lang_docs) and the exact
    resulting doc/token counts after replication — the curation step
    that equalizes a skewed language mix before training. Plan-only by
    design: a downstream explode(sequence(1, rep_factor)) consumes the
    factors table; publishing the plan keeps the op exact and lets the
    trainer decide between replication and loss re-weighting.

    Plan: one doc scan to lang-grain counts (map-side combined), one
    broadcast max, pure scalar arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    mx = c.agg(F.max("n_docs").cast("bigint").alias("mx"))
    rep = F.expr("(mx + n_docs - 1) div n_docs")
    return c.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n_docs",
        "n_tokens",
        rep.cast("bigint").alias("rep_factor"),
        (rep * F.col("n_docs")).cast("bigint").alias("resampled_docs"),
        (rep * F.col("n_tokens")).cast("bigint").alias("resampled_tokens"),
    )


# --------------------------------------------------------------------------
# corpus_datasheet
# --------------------------------------------------------------------------

_DATASHEET_SQL = """
    WITH base AS (
      SELECT source, doc_id, md5(text) AS h,
             list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
      FROM documents
    ),
    docstats AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
             CAST(sum(len(ws)) AS BIGINT) AS n_tokens,
             CAST(min(len(ws)) AS BIGINT) AS min_tokens,
             CAST(max(len(ws)) AS BIGINT) AS max_tokens
      FROM base GROUP BY 1
    ),
    vocab AS (
      SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab
      FROM (SELECT source, unnest(ws) AS tok FROM base) GROUP BY 1
    )
    SELECT d.source, d.n_docs, d.n_unique_texts,
           CAST((2 * (d.n_docs - d.n_unique_texts) * 1000000 + d.n_docs)
                // (2 * d.n_docs) AS BIGINT) AS dup_rate_micro,
           d.n_tokens, d.min_tokens, d.max_tokens,
           CAST((2 * d.n_tokens + d.n_docs) // (2 * d.n_docs) AS BIGINT)
             AS mean_tokens,
           v.n_vocab,
           CAST((2 * v.n_vocab * 1000000 + d.n_tokens)
                // (2 * d.n_tokens) AS BIGINT) AS ttr_micro
    FROM docstats d JOIN vocab v USING (source)
"""


@register("corpus_datasheet", oracle=_DATASHEET_SQL, tags=("llm", "text"))
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card in one query: doc count, exact-dup
    rate (md5 content hash, round-half-up micro), token totals and
    min/mean/max, vocabulary size, and type-token ratio — the summary
    row a dataset datasheet quotes per corpus slice. Every number is
    an integer or one integer division.

    Plan: one doc scan feeds BOTH legs, each TWO-PHASE (the r13
    dq_column_profile lesson — a direct count_distinct mixed with other
    aggregates plans an Expand over the fact rows, and var-length
    string state in the aggregate buffer degrades to SortAggregate;
    measured superlinear at the 100x probe, 4.8 -> 27.9 s for 3.3x
    data). Doc-stats pre-aggregate at (source, content-hash) grain with
    a fixed-width count/sum/min/max buffer, then roll up to source
    grain where n_unique_texts is a plain count; vocab deduplicates
    (source, token) pairs first (count-free hash distinct), then counts
    per source. Both fact-grain passes stay in hash aggregation with
    map-side combine; distinct-value-grain reducers as before. After:
    5.8 s at 30x, 19.1 s at 100x — 3.3x time for 3.3x data, linear."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.md5("text").alias("h"),
        F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias("ws"),
    )
    per_text = base.groupBy("source", "h").agg(
        F.count("*").alias("cnt"),
        F.sum(F.size("ws")).alias("tok_sum"),
        F.min(F.size("ws")).alias("tok_min"),
        F.max(F.size("ws")).alias("tok_max"),
    )
    docstats = per_text.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_unique_texts"),
        F.sum("tok_sum").cast("bigint").alias("n_tokens"),
        F.min("tok_min").cast("bigint").alias("min_tokens"),
        F.max("tok_max").cast("bigint").alias("max_tokens"),
    )
    vocab = (
        base.select("source", F.explode("ws").alias("tok"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_vocab"))
    )
    return docstats.join(vocab, "source").select(
        "source",
        "n_docs",
        "n_unique_texts",
        F.expr(
            "(2 * (n_docs - n_unique_texts) * 1000000 + n_docs)"
            " div (2 * n_docs)"
        )
        .cast("bigint")
        .alias("dup_rate_micro"),
        "n_tokens",
        "min_tokens",
        "max_tokens",
        F.expr("(2 * n_tokens + n_docs) div (2 * n_docs)")
        .cast("bigint")
        .alias("mean_tokens"),
        "n_vocab",
        F.expr("(2 * n_vocab * 1000000 + n_tokens) div (2 * n_tokens)")
        .cast("bigint")
        .alias("ttr_micro"),
    )
