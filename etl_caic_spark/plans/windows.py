"""Window functions + as-of join (SURVEY.md §2.C windows/joins, milestone
M4 batch half): ranking, lag/lead, running/moving frames, top-k per group,
and the union+window as-of join.

Scale notes: every query here shuffles once on its partition key and sorts
within partitions — the minimal plan for windowed analytics. Rank outputs
are made deterministic either by full tiebreaks (row_number) or by being
functions of the key values alone (rank/dense_rank)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.asof import asof_join
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "win_rank",
    oracle="""
    SELECT
      l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
      CAST(row_number() OVER (PARTITION BY l_suppkey
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      CAST(rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS BIGINT) AS rnk,
      CAST(dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS BIGINT) AS drnk
    FROM lineitem
    WHERE l_quantity >= 45
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number (full tiebreak) + rank/dense_rank (value-determined)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    w_rn = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    w_q = Window.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
        F.rank().over(w_q).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_q).cast("bigint").alias("drnk"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT
      event_id, user_id, value,
      lag(value) OVER w AS prev_value,
      lead(value) OVER w AS next_value,
      lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead with default — per-user event timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT
      o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
      CAST(count(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).cast("bigint").alias("order_seq"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT
      event_id, user_id,
      round(avg(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    WHERE event_type = 'view'
    """,
    tags=("window",),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded rows frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(k AS BIGINT) AS k
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS k
      FROM orders
    )
    WHERE k <= 3
    """,
    tags=("window",),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank-filter pattern.

    Scale: Spark pushes the rank filter into the sort via
    WindowGroupLimit (partial per-partition top-k before the shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("k"),
        )
        .filter(F.col("k") <= 3)
    )


@register(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(max(event_id) AS BIGINT) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, p.value,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest earlier-or-equal
    click (DuckDB oracle: native ASOF LEFT JOIN). See operators/asof.py for
    the single-shuffle union+window implementation."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["click_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_id",
    )
