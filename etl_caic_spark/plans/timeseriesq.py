"""Time-series rollup queries (hypertable-style continuous aggregates)
over the events table — minute/hour/day grains where each coarser grain
is computed from the finer grain's partials (operators/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import timeseries as TS
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "rollup_timeseries",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    g AS (
      SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket,
             event_type, vc FROM c
      UNION ALL
      SELECT 'hour', date_trunc('hour', ts), event_type, vc FROM c
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, vc FROM c
    )
    SELECT grain, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           round(CAST(sum(vc) AS BIGINT) / 100.0, 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n,
           min(vc) / 100.0 AS min_value,
           max(vc) / 100.0 AS max_value,
           round(CAST(sum(vc) AS BIGINT) / 100.0 / count(*), 6) AS avg_value
    FROM g
    GROUP BY grain, bucket, event_type
    """,
    tags=("timeseries", "agg"),
)
def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup: minute partials from raw events, hour from
    minute, day from hour (sum-of-sums / count-of-counts / min-of-mins).
    The raw table is scanned ONCE; the oracle recomputes each grain from
    raw directly — equality proves the partial-compose path is lossless.

    The measure is rolled up in integer CENTS (value is 2-decimal): a
    double sum's last bits depend on partial-aggregation order, so a
    6-decimal rounding of sum/n can flip between runs with different
    partitioning; integer sums are order-independent and exact, and the
    dollar outputs are reconstructed with the identical expression on
    both engines. The reference has no time-series ops (SURVEY.md §2.C
    streaming scope); this is the continuous-aggregate shape a 100 TB
    event store needs."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    hier = TS.rollup_hierarchy(ev, "ts", ("event_type",), "vc")
    return hier.select(
        "grain",
        "bucket",
        "event_type",
        F.round(F.col("sum_value") / 100.0, 2).alias("sum_value"),
        "n",
        (F.col("min_value") / 100.0).alias("min_value"),
        (F.col("max_value") / 100.0).alias("max_value"),
        F.round(F.col("sum_value") / 100.0 / F.col("n"), 6).alias("avg_value"),
    )
