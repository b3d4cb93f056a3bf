"""Wave 22b (round 5): operational-analytics gates — data-volume anomaly
detection (the DQ check every ingestion pipeline schedules), a
weighted-average aggregate (the ratio-of-sums shape naive AVG gets
wrong), and day-over-day percent change on a daily rollup.

Exactness: counts/cents are BIGINT; every ratio is one division of
exact integers rounded to 6 dp with identical expression trees on both
engines; timestamps reduce to DATE strings before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "dq_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    trailed AS (
      SELECT event_type, day, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS trail_sum,
             CAST(count(n) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS trail_days
      FROM daily
    )
    SELECT event_type, day, n, trail_sum, trail_days,
           round(n * 1.0 * trail_days / trail_sum, 6) AS volume_ratio,
           CAST(CASE WHEN n * trail_days > 2 * trail_sum
                     OR 2 * n * trail_days < trail_sum
                THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM trailed WHERE trail_days >= 3
    """,
    tags=("dq", "window", "timeseries"),
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-volume anomaly detection: daily row counts per
    event_type compared against the TRAILING 7-day window (excluding
    the current day); a day is anomalous when its count is more than
    2× or under ½ the trailing mean. The threshold test is done with
    CROSS-MULTIPLIED integers (n·days vs 2·Σ) so the flag is exact —
    the reported ratio is a single rounded division for humans. Days
    with under 3 trailing observations are withheld (cold start).

    Scale: the expensive part is the daily pre-aggregate — map-side
    combinable, output is |types|×|days| rows — and the window then
    runs on that tiny rollup, partitioned by type. At 100 TB the
    detector's cost is the one groupBy shuffle; this is the shape DQ
    monitors (e.g. volume freshness checks) actually ship."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailed = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).cast("bigint").alias("trail_sum"),
        F.count("n").over(w).cast("bigint").alias("trail_days"),
    )
    return trailed.where(F.col("trail_days") >= 3).select(
        "event_type",
        "day",
        "n",
        "trail_sum",
        "trail_days",
        F.round(
            F.col("n") * 1.0 * F.col("trail_days") / F.col("trail_sum"), 6
        ).alias("volume_ratio"),
        F.when(
            (F.col("n") * F.col("trail_days") > 2 * F.col("trail_sum"))
            | (2 * F.col("n") * F.col("trail_days") < F.col("trail_sum")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity) AS BIGINT) AS w,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS x_cents
      FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(w) AS BIGINT) AS total_weight,
           CAST(sum(w * x_cents) AS BIGINT) AS wsum_cents,
           round(sum(w * x_cents) / (100.0 * sum(w)), 6) AS weighted_avg_price
    FROM t GROUP BY 1, 2
    """,
    tags=("agg",),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per (returnflag, linestatus) —
    the ratio-of-sums aggregate that a naive avg(price) silently gets
    wrong (it weights each LINE equally, not each UNIT). Both moments
    (Σw, Σw·x) are BIGINT-exact integer cents, partial-aggregated
    map-side; the weighted mean is one division at the end. Σw·x fits
    int64 to ~10⁸ rows at these magnitudes; promote the product sum to
    DECIMAL(38,0) beyond that — same shape.

    Scale: single map-side-combinable groupBy over a pruned 4-column
    scan; output is the 6-group cross. The important property at
    100 TB is that a weighted mean is ALGEBRAIC — two mergeable sums —
    so it never needs sorted or centralized data."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity").cast("bigint").alias("w"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("x_cents"),
    )
    return t.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("w").cast("bigint").alias("total_weight"),
        F.sum(F.col("w") * F.col("x_cents")).cast("bigint").alias("wsum_cents"),
        F.round(
            F.sum(F.col("w") * F.col("x_cents")) / (100.0 * F.sum("w")), 6
        ).alias("weighted_avg_price"),
    )


@register(
    "win_pct_change",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT day, rev_cents,
           CAST(lag(rev_cents) OVER (ORDER BY day) AS BIGINT) AS prev_cents,
           round((rev_cents - lag(rev_cents) OVER (ORDER BY day)) * 100.0
                 / lag(rev_cents) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
    tags=("window", "timeseries"),
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day percent change of daily revenue — the reporting
    staple layered on a rollup: aggregate to integer day cents first
    (order-proof BIGINT), then a lag(1) window and one rounded
    division. The first day reports NULLs, preserved as the honest
    cold-start answer.

    Scale: the window is over the DAILY ROLLUP (|days| rows), not the
    fact table, so the single-partition ORDER BY day is bounded by
    calendar size — the groupBy shuffle is the only full-data
    exchange. Partition the window by year if |days| ever matters."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("day")
    prev = F.lag("rev_cents").over(w)
    return daily.select(
        "day",
        "rev_cents",
        prev.cast("bigint").alias("prev_cents"),
        F.round((F.col("rev_cents") - prev) * 100.0 / prev, 6).alias(
            "pct_change"
        ),
    )
