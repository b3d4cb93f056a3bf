"""Sixth wave (milestone M12): histogram binning, TPC-H Q18-shaped
big-aggregation join, and window-based sessionization (the batch dual of
session_window — same oracle SQL, different Spark implementation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 2) AS avg_in_bucket
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via floor-division binning (a single
    aggregate pass; the building block under numeric profiling)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        bucket.alias("bucket"),
        (bucket * 50000).cast("double").alias("bucket_lo"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_in_bucket"),
    )


@register(
    "tpch_q18_shape",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
           round(qty.total_qty, 2) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1) qty
      ON qty.l_orderkey = o_orderkey
    """,
    tags=("headline", "agg", "join"),
)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): heavy aggregation on the
    fact table, HAVING filter, then join back to orders. The aggregate is
    computed ONCE and reused for both the filter and the output column
    (self-join on the aggregated frame, not a re-scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    qty = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty"))
    big = qty.filter(F.col("total_qty") > 150)
    return o.join(big, o["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
        F.round("total_qty", 2).alias("total_qty"),
    )


@register(
    "sessionize_window",
    oracle="""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           CAST(sid AS BIGINT) AS session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("window", "session"),
)
def sessionize_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative-sum gaps-and-islands — the
    window-function dual of session_window (stream_session), implemented
    with the SAME algorithm the oracle uses. Two window passes over one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gapped = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            # µs-exact gap compare (cast-to-long would truncate to seconds
            # and disagree with the oracle's INTERVAL comparison)
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = gapped.withColumn("sid", F.sum("new_s").over(w_cum))
    return sessions.groupBy("user_id", F.col("sid").cast("bigint").alias("session_seq")).agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count("*").alias("n_events"),
    )
