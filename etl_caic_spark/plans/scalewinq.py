"""Scale-safe twins of the global-window queries.

Four registered queries (feat_bin_quantile, dq_sequence_gaps,
feat_quantile_normalize, stat_ks_two_sample) are exact-semantics anchors
whose registered plans contain a WindowExec with NO partition spec — a
single-task sort at 100 TB. Each gets a twin here whose executed plan
has only PARTITIONED windows (or none at all), asserted by
tests/test_scalewin_twins.py:

- ``feat_bin_quantile_dist`` / ``feat_quantile_normalize_dist`` replace
  the global row_number with operators/prefix.py's range-partition +
  boundary-offset construction and reuse the ORIGINAL oracle SQL — the
  hash match proves the distributed rank is value-identical to the
  global window, not merely similar.
- ``dq_sequence_gaps_dist`` reuses the sorted-neighborhood machinery
  (operators/snm.py) with W=1: consecutive-row pairs in global key
  order, windows partitioned by range group, one boundary row per
  group. Same oracle as dq_sequence_gaps.
- ``stat_ks_binned`` moves the ECDF supremum onto a FIXED 64-cell grid:
  the cumulative is a triangular join over the 64-row bin table (both
  sides broadcast-size by construction), so the plan has no window at
  all and its cost is independent of the metric's support cardinality.
  l_quantity is integer-valued in [1,50], so the 64-bin grid loses
  nothing here and the statistic equals the exact KS; on a continuous
  metric the grid coarsens the supremum (documented trade).

The originals stay registered as the readable semantic anchors; these
are the formulations a 1000-executor cluster would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.operators.prefix import with_global_order
from etl_caic_spark.operators.snm import sorted_neighborhood_pairs
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_BIN_QUANTILE_ORACLE = """
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
"""


@register(
    "feat_bin_quantile_dist",
    oracle=_BIN_QUANTILE_ORACLE,
    tags=("features", "ml", "window", "scale"),
)
def feat_bin_quantile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile binning WITHOUT the global ntile window: the global
    rank comes from operators/prefix.py (range partition, local
    row_number, broadcast boundary offsets), and ntile's bucket
    arithmetic is applied as a scalar expression — buckets 1..(N mod 10)
    take ceil(N/10) rows, the rest floor(N/10), exactly the SQL-standard
    ntile fill order both engines implement. The oracle is the SAME
    ntile SQL as feat_bin_quantile, so the hash match proves the
    distributed rank + arithmetic reproduces ntile bit-for-bit.

    Plan: one range shuffle, partitioned windows only, an O(P) offsets
    collect, one broadcast of the single-row count — nothing funnels
    through one task at any scale.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    r = with_global_order(
        o, ["o_totalprice", "o_orderkey"], rn_col="rn", num_partitions=16
    )
    n = o.agg(
        F.count("*").cast("bigint").alias("n_tot"),
    ).select(
        "n_tot",
        F.expr("n_tot div 10").alias("q"),
        (F.col("n_tot") % 10).alias("rem"),
    )
    binned = r.crossJoin(F.broadcast(n)).select(
        F.when(
            F.col("rn") <= F.col("rem") * (F.col("q") + 1),
            F.expr("(rn - 1) div (q + 1) + 1"),
        )
        .otherwise(F.expr("rem + (rn - rem * (q + 1) - 1) div q + 1"))
        .cast("int")
        .alias("bin"),
        "cents",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


@register(
    "feat_quantile_normalize_dist",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type AS source, value
      FROM events WHERE event_id % 4 = 0
    ), ranked AS (
      SELECT *,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY value, event_id) AS BIGINT)
               AS r,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      FROM s
    ), pooled AS (
      SELECT value AS pooled_value,
             CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT)
               AS idx
      FROM s
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM s)
    SELECT event_id, source, value, pooled_value AS norm_value
    FROM ranked CROSS JOIN tot
    JOIN pooled ON pooled.idx = (r * n_pool + n_s - 1) // n_s
    WHERE event_id % 13 = 0
    """,
    tags=("ml", "feat", "scale"),
)
def feat_quantile_normalize_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization with the pooled ranking distributed: the
    per-source rank windows were already partitioned (and stay); the
    ONE global row_number over the pooled sample — the scale caveat
    feat_quantile_normalize documents — is replaced by
    operators/prefix.py's boundary-offset rank. Same oracle as the
    original, so the hash match proves idx-for-idx equality.

    Plan: partitioned windows only; the rank join keys on idx, which
    both sides derive from the same total order, so AQE sees an
    equi-join on a well-distributed bigint.
    """
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 4 == 0)
        .select("event_id", F.col("event_type").alias("source"), "value")
    )
    wsrc = Window.partitionBy("source").orderBy("value", "event_id")
    ranked = s.select(
        "*",
        F.row_number().over(wsrc).cast("bigint").alias("r"),
        F.count("*")
        .over(Window.partitionBy("source"))
        .cast("bigint")
        .alias("n_s"),
    )
    pooled = with_global_order(
        s.select("value", "event_id"),
        ["value", "event_id"],
        rn_col="idx",
        num_partitions=16,
    ).select(F.col("value").alias("pooled_value"), "idx")
    tot = s.agg(F.count("*").cast("bigint").alias("n_pool"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "idx", F.expr("(r * n_pool + n_s - 1) div n_s").cast("bigint")
        )
        .join(pooled, "idx")
        .filter(F.col("event_id") % 13 == 0)
        .select(
            "event_id", "source", "value",
            F.col("pooled_value").alias("norm_value"),
        )
    )


@register(
    "dq_sequence_gaps_dist",
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
    tags=("dq", "scale"),
)
def dq_sequence_gaps_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit without the global lag window: consecutive
    key pairs come from operators/snm.py with W=1 (range partition,
    per-group lead, one boundary row duplicated per group — the same
    algebra hash-proven for link_snm_distributed), then gaps are the
    pairs more than 1 apart. Oracle is dq_sequence_gaps' global-lag
    SQL (same 'F'-status slice, which is what makes the fixture's
    audit non-vacuous — thousands of gap rows): the hash match proves
    no boundary pair is lost or invented.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderkey").alias("s"),
        )
    )
    pairs = sorted_neighborhood_pairs(o, ["k"], "s", w=1, num_partitions=16)
    return (
        pairs.filter(F.col("b_k") - F.col("a_k") > 1)
        .select(
            F.col("a_k").alias("gap_after"),
            F.col("b_k").alias("next_key"),
            (F.col("b_k") - F.col("a_k") - 1).cast("bigint").alias("missing"),
        )
    )


@register(
    "stat_ks_binned",
    oracle="""
    WITH s AS (
      SELECT least(CAST(floor(l_quantity) AS BIGINT), 63) AS bin,
             CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS in_r
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), n AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n1, CAST(sum(in_r) AS BIGINT) AS n2
      FROM s
    ), c AS (
      SELECT bin, CAST(sum(in_a) AS BIGINT) AS a,
             CAST(sum(in_r) AS BIGINT) AS r
      FROM s GROUP BY 1
    ), ecdf AS (
      SELECT g.bin, CAST(sum(h.a) AS BIGINT) AS c1,
             CAST(sum(h.r) AS BIGINT) AS c2
      FROM c g JOIN c h ON h.bin <= g.bin GROUP BY 1
    ), d AS (
      SELECT CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num, n1, n2
      FROM ecdf CROSS JOIN n GROUP BY n1, n2
    )
    SELECT n1, n2, d_num,
           round(d_num * 1.0 / (n1 * n2), 6) AS ks_d,
           round(sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1.358, 6) AS crit_05
    FROM d
    """,
    tags=("stat", "dq", "ml", "scale"),
)
def stat_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS on a FIXED 64-bin grid — the windowless drift
    gate: per-bin counts (map-side partial), then the cumulative ECDF
    as a triangular join of the 64-row bin table against itself (both
    sides bounded by CONSTRUCTION, not by the data, so both broadcast
    and the plan contains zero WindowExec). The supremum search stays
    in BIGINT cross-multiplication. l_quantity is integral in [1,50],
    so the grid is lossless here and the statistic equals
    stat_ks_two_sample's exact D; for a continuous metric the grid
    coarsens D downward by at most the per-cell mass — the standard
    binned-KS trade, priced by the fixed cell count.
    """
    s = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.least(
                F.floor(F.col("l_quantity")).cast("bigint"), F.lit(63)
            ).alias("bin"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("in_a"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("in_r"),
        )
    )
    n = s.agg(
        F.sum("in_a").cast("bigint").alias("n1"),
        F.sum("in_r").cast("bigint").alias("n2"),
    )
    c = s.groupBy("bin").agg(
        F.sum("in_a").cast("bigint").alias("a"),
        F.sum("in_r").cast("bigint").alias("r"),
    )
    g = c.select(F.col("bin"), F.col("a"), F.col("r"))
    h = c.select(
        F.col("bin").alias("hbin"), F.col("a").alias("ha"), F.col("r").alias("hr")
    )
    ecdf = (
        g.join(F.broadcast(h), F.col("hbin") <= F.col("bin"))
        .groupBy("bin")
        .agg(
            F.sum("ha").cast("bigint").alias("c1"),
            F.sum("hr").cast("bigint").alias("c2"),
        )
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
        F.round(
            F.col("d_num") * F.lit(1.0) / (F.col("n1") * F.col("n2")), 6
        ).alias("ks_d"),
        F.round(
            F.sqrt(
                (F.col("n1") + F.col("n2"))
                * F.lit(1.0)
                / (F.col("n1") * F.col("n2"))
            )
            * F.lit(1.358),
            6,
        ).alias("crit_05"),
    )


from etl_caic_spark.plans.analytics5q import RFM_ORACLE, rfm_base  # noqa: E402


@register(
    "cust_rfm_segments_dist",
    oracle=RFM_ORACLE,
    tags=("analytics", "window", "scale"),
)
def cust_rfm_segments_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of cust_rfm_segments (plans/analytics5q.py): the three
    GLOBAL ntile(5) windows — single-task sorts at 100 TB customer
    counts — are replaced by three range-partitioned global ranks
    (operators/prefix.py) plus ntile's bucket arithmetic as a scalar
    expression, then joined back on the customer key. Hash-matches the
    ORIGINAL oracle, proving the distributed construction reproduces
    the global windows exactly.

    Plan: customer-grain base computed once (localCheckpoint — reused
    by all three rank branches without recomputing the orders scan),
    3 range shuffles + partitioned windows + O(P) offset collects, a
    broadcast single-row count, and two customer-key hash joins. No
    unpartitioned WindowExec anywhere (plan-asserted by
    tests/test_scalewin_twins.py)."""
    base = rfm_base(spark, sf_dir).localCheckpoint()
    n = base.agg(F.count("*").cast("bigint").alias("n_tot"))

    def score(order_expr_cols: list, name: str) -> DataFrame:
        src = base.select(
            "o_custkey",
            *[
                c.alias(f"_o{i}")
                for i, c in enumerate(order_expr_cols)
            ],
        )
        oc = [f"_o{i}" for i in range(len(order_expr_cols))] + ["o_custkey"]
        r = with_global_order(src, oc, rn_col="rn", num_partitions=16)
        return r.crossJoin(F.broadcast(n)).select(
            "o_custkey",
            F.when(
                F.col("rn") <= (F.col("n_tot") % 5) * (F.expr("n_tot div 5") + 1),
                F.expr("(rn - 1) div (n_tot div 5 + 1) + 1"),
            )
            .otherwise(
                # greatest(.., 1) guards the n_tot < 5 degenerate case:
                # there the when-branch already covers every rn, but an
                # un-guarded div-by-zero would break under ANSI mode
                # (round-7 ADVICE item)
                F.expr(
                    "n_tot % 5 + (rn - (n_tot % 5) * (n_tot div 5 + 1) - 1)"
                    " div greatest(n_tot div 5, 1) + 1"
                )
            )
            .cast("int")
            .alias(name),
        )

    r_s = score([F.col("recency_days")], "r_score")
    f_s = score([-F.col("frequency")], "f_score")
    m_s = score([-F.col("monetary_cents")], "m_score")
    scored = (
        base.join(r_s, "o_custkey")
        .join(f_s, "o_custkey")
        .join(m_s, "o_custkey")
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_score",
            "f_score",
            "m_score",
        )
    )
    return scored.withColumn(
        "segment",
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular"),
    )
