"""Feature-store build: one wide, entity-grain feature row per
customer, assembled from three sources at three different grains
(customer dim, order facts, lineitem facts) — the canonical offline
feature-store materialization that the individual feat_*/eval_*
queries feed into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "feature_store_customer",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS corpus_end FROM orders),
    ord AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            CAST(corpus_end AS DATE)) AS BIGINT)
               AS recency_days
      FROM orders CROSS JOIN mx
      GROUP BY o_custkey, corpus_end
    ), li AS (
      SELECT o_custkey,
             CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN l_returnflag IN ('A', 'R') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS disc_pct_sum
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    )
    SELECT c_custkey, c_nationkey, c_mktsegment,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(monetary_cents, 0) AS monetary_cents,
           recency_days,
           coalesce(n_brands, 0) AS n_brands,
           coalesce(n_items, 0) AS n_items,
           coalesce(n_returned, 0) AS n_returned,
           CASE WHEN n_items > 0
                THEN round(n_returned * 1.0 / n_items, 6) END AS return_rate,
           CASE WHEN n_items > 0
                THEN round(disc_pct_sum * 1.0 / n_items, 6) END
             AS avg_disc_pct
    FROM customer
    LEFT JOIN ord ON c_custkey = ord.o_custkey
    LEFT JOIN li ON c_custkey = li.o_custkey
    """,
    tags=("ml", "analytics", "pipeline"),
)
def feature_store_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline feature-store materialization at customer grain: order
    recency/frequency/monetary, brand breadth, return rate and mean
    discount from lineitem (carried up two grains), entity dims from
    the customer table; customers with no orders keep a row with
    zero-filled counts and NULL rate features (absence != 0 for a
    trained model).

    Plan: each source aggregates AT ITS OWN GRAIN first (map-side
    partials), so the joins move one row per entity, never raw facts —
    the aggregate-then-join shape that separates a feature store from
    a join-then-aggregate accident that shuffles the fact table twice.
    Monetary/discount stay integer cents/percent until the final
    per-row division. At 100 TB every agg and both left joins share
    the customer-key partitioning, and AQE coalesces them into one
    exchange-reuse chain.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    mx = o.agg(F.max("o_orderdate").alias("corpus_end"))
    ord_f = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "corpus_end")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
            F.max("o_orderdate").alias("last_order"),
        )
        .select(
            "o_custkey",
            "n_orders",
            "monetary_cents",
            F.datediff(
                F.col("corpus_end").cast("date"), F.col("last_order").cast("date")
            )
            .cast("bigint")
            .alias("recency_days"),
        )
    )
    li_f = (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.select("p_partkey", "p_brand")), l.l_partkey == p.p_partkey)
        .groupBy("o_custkey")
        .agg(
            F.count_distinct("p_brand").cast("bigint").alias("n_brands"),
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                F.when(F.col("l_returnflag").isin("A", "R"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_returned"),
            F.sum(F.round(F.col("l_discount") * 100).cast("bigint"))
            .cast("bigint")
            .alias("disc_pct_sum"),
        )
    )
    out = (
        c.join(ord_f, c.c_custkey == ord_f.o_custkey, "left")
        .drop(ord_f.o_custkey)
        .join(li_f, c.c_custkey == li_f.o_custkey, "left")
        .drop(li_f.o_custkey)
    )
    has_items = F.col("n_items") > 0
    return out.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("monetary_cents", F.lit(0)).alias("monetary_cents"),
        "recency_days",
        F.coalesce("n_brands", F.lit(0)).alias("n_brands"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
        F.when(
            has_items,
            F.round(F.col("n_returned") * F.lit(1.0) / F.col("n_items"), 6),
        ).alias("return_rate"),
        F.when(
            has_items,
            F.round(F.col("disc_pct_sum") * F.lit(1.0) / F.col("n_items"), 6),
        ).alias("avg_disc_pct"),
    )


@register(
    "feat_quantile_normalize",
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
    tags=("ml", "feat"),
)
def feat_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (batch-effect correction):
    each value is replaced by the POOLED value at its within-source
    quantile — after normalization every source has an identical value
    distribution. The quantile mapping is exact integer rank
    arithmetic: target pooled index = ceil(r * n_pool / n_s) computed
    as (r*n_pool + n_s - 1) DIV n_s, so no float quantile ever exists
    and the cross-engine hash is exact.

    Plan: per-source rank windows (partitioned, parallel) plus ONE
    global ranking of the pooled sample — the exact-semantics anchor.
    At 100 TB the pooled ranking is replaced by approx-quantile
    boundaries (feat_bin_quantile's machinery) and the join maps ranks
    onto the boundary grid; this query pins the semantics that
    approximation must converge to.
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
    pooled = s.select(
        F.col("value").alias("pooled_value"),
        F.row_number()
        .over(Window.orderBy("value", "event_id"))
        .cast("bigint")
        .alias("idx"),
    )
    tot = s.agg(F.count("*").cast("bigint").alias("n_pool"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        # Integer ceil-division via `div` (never a double): matches
        # DuckDB's `//` exactly at any magnitude.
        .withColumn(
            "idx", F.expr("(r * n_pool + n_s - 1) div n_s").cast("bigint")
        )
        .join(pooled, "idx")
        .filter(F.col("event_id") % 13 == 0)
        .select("event_id", "source", "value", F.col("pooled_value").alias("norm_value"))
    )
