"""Wave 13 (round 5): per-group exact linear regression, equal-frequency
quantile binning, and a smoothed bigram language-model score — the
remaining statistical-feature shapes a training-data pipeline runs that
the registry didn't yet cover.

Exactness strategy: regression moments are integer sums (x = dense rank
index, y = integer cents), so slope/intercept are single divisions of
exact BIGINTs — no accumulation-order drift; ntile is deterministic
under a TOTAL order; the bigram LM mirrors text_unigram_logprob's
integer-count + micro-nat-log convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "stat_linreg_group",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY 1
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept_cents,
           round(((n * sxy - sx * sy) * 1.0) * ((n * sxy - sx * sy) * 1.0)
                 / (((n * sxx - sx * sx) * 1.0) * ((n * syy - sy * sy) * 1.0)),
                 6) AS r2
    FROM m
    """,
    tags=("stats", "features", "window"),
)
def stat_linreg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (value-vs-time trend per
    event_type) computed from EXACT integer moments: x is the dense
    (ts, event_id) rank, y is integer cents, so n/Σx/Σy/Σx²/Σxy/Σy² are
    all BIGINT-exact regardless of partitioning or summation order —
    slope is a single division of exact integers, the intercept reuses
    it as ȳ − slope·x̄ (the all-integer cross-moment numerator overflows
    int64 for big groups; for still-larger groups promote the moments to
    DECIMAL(38,0) and keep the same shape), and r² multiplies the exact
    moments as doubles with the identical expression tree on both
    engines. This is the distributed-safe way to
    do regression: the naive avg-centered formulas accumulate doubles
    whose order varies run to run. One shuffle for the rank window, one
    map-side-combinable aggregate; the result is one row per group. At
    100 TB swap the rank for an epoch-derived x and skip the window —
    the moment aggregation is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = ev.select(
        "event_type",
        F.row_number().over(w).cast("bigint").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return m.select(
        "event_type",
        "n",
        F.round(cov_n / var_n, 6).alias("slope_cents"),
        # ȳ - slope·x̄ form, NOT (sy·sxx - sx·sxy)/var_n: the all-integer
        # numerator overflows int64 once n·Σx² passes ~1e12 (it did at
        # sf0.1). slope is already an exact-BIGINT division; reusing it
        # keeps the expression tree identical on both engines.
        F.round((sy - (cov_n / var_n) * sx) / n, 6).alias("intercept_cents"),
        F.round(
            (cov_n * F.lit(1.0)) * (cov_n * F.lit(1.0))
            / ((var_n * F.lit(1.0)) * (vary_n * F.lit(1.0))),
            6,
        ).alias("r2"),
    )


@register(
    "feat_bin_quantile",
    oracle="""
    WITH binned AS (
      SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM binned GROUP BY 1
    """,
    tags=("features", "ml", "window"),
)
def feat_bin_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order value — the quantile
    bucketizer every feature pipeline needs, expressed as ntile over a
    TOTAL order ((o_totalprice, o_orderkey) — the orderkey tiebreak is
    what makes bin assignment deterministic and therefore oracle-exact;
    bare ntile over a column with duplicates is engine-dependent at the
    boundaries). Emits each bin's edges, count, and exact cents mass.
    The global-order window is the scale caveat: at 100 TB you'd switch
    to approx_percentile cut points + a broadcast range join, accepting
    approximate edges; this query pins the exact-semantics baseline that
    variant must approximate."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = o.select(
        F.ntile(10).over(w).alias("bin"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.sum("cents").alias("sum_cents"),
    )


@register(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    bg AS (
      SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
           FROM bg GROUP BY 1, 2),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (
        SELECT unnest(l) AS w FROM toks
      ) GROUP BY 1
    ),
    v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
    lp AS (
      SELECT w1, w2,
             CAST(round(round(ln((cb + 1.0) / (cu + vocab)), 6) * 1e6)
                  AS BIGINT) AS lp_micro
      FROM cb JOIN uni ON uni.w = cb.w1 CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_micro
    FROM bg JOIN lp USING (w1, w2)
    GROUP BY 1
    """,
    tags=("text", "llm"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model score per document — the fluency /
    perplexity-proxy quality signal one step up from
    text_unigram_logprob: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) with
    add-one smoothing over the whitespace token stream. All counts are
    corpus-global integers and the log is frozen to micro-nats
    (round(ln,6)*1e6 → BIGINT) BEFORE the per-document sum, so the
    result hash-matches despite floating logs. Bigrams are built with a
    zero-shuffle higher-order transform over the token array (guarded
    for <2-token docs — Spark's sequence(1,0) counts DOWN, so the guard
    is correctness, not style); the model tables are two
    map-side-combinable aggregates that broadcast back onto the bigram
    stream. At 100 TB the bigram model table is the big object — it
    shuffle-joins while the vocab scalar broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    pairs = F.when(
        F.size("l") >= 2,
        F.expr(
            "transform(sequence(1, size(l) - 1),"
            " i -> struct(l[i - 1] AS w1, l[i] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = (
        toks.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    uni = (
        toks.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    vocab = uni.agg(F.count("*").alias("vocab"))
    lp = (
        cb.join(uni, cb["w1"] == uni["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                F.round(
                    F.round(
                        F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("vocab"))),
                        6,
                    )
                    * 1e6
                ).cast("bigint")
            ).alias("lp_micro"),
        )
    )
    return (
        bg.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("logprob_micro"),
        )
    )
