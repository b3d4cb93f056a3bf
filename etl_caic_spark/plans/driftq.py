"""Distribution-drift detection: exact two-sample Kolmogorov-Smirnov
statistic and Population Stability Index — the monitoring gates that
decide whether a trained model's input distribution has shifted enough
to retrain. Both are exact-integer constructions (cross-multiplied
ECDFs, fixed bin edges), so the driver hash-match is bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "stat_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT l_quantity AS x,
             CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS in_r
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), n AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n1, CAST(sum(in_r) AS BIGINT) AS n2
      FROM s
    ), ecdf AS (
      SELECT x,
             CAST(sum(sum(in_a)) OVER (ORDER BY x) AS BIGINT) AS c1,
             CAST(sum(sum(in_r)) OVER (ORDER BY x) AS BIGINT) AS c2
      FROM s GROUP BY x
    ), d AS (
      SELECT CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num, n1, n2
      FROM ecdf CROSS JOIN n GROUP BY n1, n2
    )
    SELECT n1, n2, d_num,
           round(d_num * 1.0 / (n1 * n2), 6) AS ks_d,
           round(sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1.358, 6) AS crit_05
    FROM d
    """,
    tags=("stat", "dq", "ml"),
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic for l_quantity
    between returnflag populations A and R: D = max |F_A(x) - F_R(x)|,
    computed as max |c1*n2 - c2*n1| over the pooled support so the
    supremum search happens entirely in BIGINT (one division at the
    end), plus the 5% critical value 1.358*sqrt((n1+n2)/(n1*n2)).

    Plan: one groupBy on the value support (map-side partial), one
    cumulative window over the support in value order, one scalar max.
    The support-ordered window is the honest cost of an exact ECDF; at
    100 TB the support of a measured metric is usually far smaller than
    the row count (here ~50 distinct quantities), so the window input
    is tiny after the first aggregate — the same shape as
    sketch_histogram_quantile's exact anchor.
    """
    s = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_quantity").alias("x"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("in_a"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("in_r"),
        )
    )
    n = s.agg(
        F.sum("in_a").cast("bigint").alias("n1"),
        F.sum("in_r").cast("bigint").alias("n2"),
    )
    per_x = s.groupBy("x").agg(
        F.sum("in_a").alias("a"), F.sum("in_r").alias("r")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = per_x.select(
        "x",
        F.sum("a").over(w).cast("bigint").alias("c1"),
        F.sum("r").over(w).cast("bigint").alias("c2"),
    )
    d = (
        ecdf.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
            .cast("bigint")
            .alias("d_num")
        )
    )
    return d.select(
        "n1",
        "n2",
        "d_num",
        F.round(F.col("d_num") * F.lit(1.0) / (F.col("n1") * F.col("n2")), 6).alias(
            "ks_d"
        ),
        F.round(
            F.sqrt((F.col("n1") + F.col("n2")) * F.lit(1.0) / (F.col("n1") * F.col("n2")))
            * F.lit(1.358),
            6,
        ).alias("crit_05"),
    )


@register(
    "stat_psi_drift",
    oracle="""
    WITH s AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderdate <  TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
               AS in_ref,
             CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
               AS in_cur
      FROM orders
    ), binned AS (
      SELECT least(CAST(floor(x / 50000) AS BIGINT), 9) AS bin, in_ref, in_cur
      FROM s
    ), counts AS (
      SELECT bin,
             CAST(sum(in_ref) AS BIGINT) AS c_ref,
             CAST(sum(in_cur) AS BIGINT) AS c_cur
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c_ref) AS BIGINT) AS t_ref,
             CAST(sum(c_cur) AS BIGINT) AS t_cur
      FROM counts
    )
    SELECT bin, c_ref, c_cur,
           round((c_cur + 0.5) / (t_cur + 5.0)
                 - (c_ref + 0.5) / (t_ref + 5.0), 6) AS p_diff,
           CAST(round(
             ((c_cur + 0.5) / (t_cur + 5.0) - (c_ref + 0.5) / (t_ref + 5.0))
             * ln(((c_cur + 0.5) / (t_cur + 5.0))
                  / ((c_ref + 0.5) / (t_ref + 5.0)))
             * 1000000) AS BIGINT) AS psi_term_micro
    FROM counts CROSS JOIN tot
    """,
    tags=("stat", "dq", "ml"),
)
def stat_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms for order value, reference
    period (< 1998) vs current (>= 1998), over 10 fixed $50k-wide bins
    (last bin open-ended): psi_term = (p_cur - p_ref) * ln(p_cur/p_ref)
    with +0.5/+5 Laplace smoothing so empty bins stay finite — sum of
    psi_term_micro > 250000 (PSI > 0.25) is the standard retrain
    trigger. Fixed bin edges (not sample quantiles) keep the monitor
    deterministic and cross-engine exact; the quantile-edge variant
    composes with feat_bin_quantile when adaptive bins are wanted.

    Plan: one narrow projection, one 10-group aggregate, scalar totals
    broadcast back — a metadata-cost monitor at any scale.
    """
    s = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("in_ref"),
        F.when(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("in_cur"),
    )
    binned = s.select(
        # floor-then-cast: DuckDB's double->BIGINT cast rounds while
        # Spark's truncates; floor() first keeps both on the same bin.
        F.least(F.floor(F.col("x") / 50000).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bin"
        ),
        "in_ref",
        "in_cur",
    )
    counts = binned.groupBy("bin").agg(
        F.sum("in_ref").cast("bigint").alias("c_ref"),
        F.sum("in_cur").cast("bigint").alias("c_cur"),
    )
    tot = counts.agg(
        F.sum("c_ref").cast("bigint").alias("t_ref"),
        F.sum("c_cur").cast("bigint").alias("t_cur"),
    )
    p_cur = (F.col("c_cur") + F.lit(0.5)) / (F.col("t_cur") + F.lit(5.0))
    p_ref = (F.col("c_ref") + F.lit(0.5)) / (F.col("t_ref") + F.lit(5.0))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "c_ref",
        "c_cur",
        F.round(p_cur - p_ref, 6).alias("p_diff"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(1000000))
        .cast("bigint")
        .alias("psi_term_micro"),
    )


@register(
    "stat_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY 1
    ), tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM counts)
    SELECT digit, observed,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_p,
           round(observed * 1.0 / n, 6) AS observed_p,
           round(pow(observed * 1.0 / n - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                 / (ln(1.0 + 1.0 / digit) / ln(10.0)) * n, 6) AS chi2_term
    FROM counts CROSS JOIN tot
    """,
    tags=("stat", "dq"),
)
def stat_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order values — the classic
    fabricated-data / unit-mix detector: observed leading-digit shares
    vs log10(1 + 1/d), with per-digit chi-square contributions
    (sum > 15.5 rejects Benford at 5% for 8 dof).

    The leading digit comes from the INTEGER cents rendered as a string
    (integer printing is engine-identical; printing the raw double is
    NOT — Spark and DuckDB format doubles differently, the trap this
    construction avoids). Plan: one narrow projection and a 9-group
    aggregate — a metadata-cost audit at any scale.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("observed"))
    tot = counts.agg(F.sum("observed").cast("bigint").alias("n"))
    benford_p = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    observed_p = F.col("observed") * F.lit(1.0) / F.col("n")
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        F.round(benford_p, 6).alias("benford_p"),
        F.round(observed_p, 6).alias("observed_p"),
        F.round(
            F.pow(observed_p - benford_p, F.lit(2)) / benford_p * F.col("n"), 6
        ).alias("chi2_term"),
    )


@register(
    "dq_sequence_gaps",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_key
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT prev_key AS gap_after, o_orderkey AS next_key,
           CAST(o_orderkey - prev_key - 1 AS BIGINT) AS missing
    FROM o
    WHERE prev_key IS NOT NULL AND o_orderkey - prev_key > 1
    """,
    tags=("dq",),
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit of a surrogate-key stream: every gap in
    o_orderkey with its missing-count — the ingestion health check that
    catches dropped batches and partial loads. The audit runs on the
    'F'-status slice: the fixture's full key space is dense (a vacuous
    0-gap audit), while a single status partition is exactly the
    naturally-sparse subsequence the operator sees when one upstream
    partition of a feed is audited in isolation — thousands of gap
    rows exercise the arithmetic for real.

    At test scale this is a global lag window (single sort); the scale
    formulation is dq_sequence_gaps_dist (plans/scalewinq.py): the SNM
    boundary-duplication trick with W=1, hash-proven against this same
    oracle.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    w = Window.orderBy("o_orderkey")
    return (
        o.select(
            "o_orderkey", F.lag("o_orderkey").over(w).alias("prev_key")
        )
        .filter(
            F.col("prev_key").isNotNull()
            & (F.col("o_orderkey") - F.col("prev_key") > 1)
        )
        .select(
            F.col("prev_key").alias("gap_after"),
            F.col("o_orderkey").alias("next_key"),
            (F.col("o_orderkey") - F.col("prev_key") - 1)
            .cast("bigint")
            .alias("missing"),
        )
    )
