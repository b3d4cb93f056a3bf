"""Hypertable-style multi-resolution time-series rollups (continuous
aggregates): raw events → minute partials → hour → day, where every
coarser grain is computed FROM the finer grain's partial aggregates, not
from the raw table.

This is the TimescaleDB/Druid "continuous aggregate" shape re-expressed
in Spark. Only the finest grain ever touches the raw fact table (one
shuffle on (bucket, dims) with map-side combine); each coarser grain
re-aggregates the already-tiny finer rollup — at 100 TB the raw scan
happens once, and the hour/day aggregations read megabytes, not
terabytes. sum/count/min/max compose losslessly across grains; avg is
derived as sum/count at read time (never averaged-of-averages).

The reference has no time-series surface (its 197-line Lambda is
snapshot-shaped — /root/reference/task.ts); this extends the engine for
the events table per SURVEY.md §2.C streaming/analytics scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Partial aggregates that compose across grains: sum of sums, sum of
# counts, min of mins, max of maxes.
_PARTIALS = ("sum_value", "n", "min_value", "max_value")


def rollup_finest(
    df: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grain: str = "minute",
) -> DataFrame:
    """The ONE aggregation that reads the raw table: truncate to the
    finest grain and compute composable partials."""
    return (
        df.withColumn("bucket", F.date_trunc(grain, F.col(ts_col)))
        .groupBy("bucket", *dims)
        .agg(
            F.sum(value_col).alias("sum_value"),
            F.count("*").alias("n"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def rollup_coarser(finer: DataFrame, grain: str, dims: tuple[str, ...]) -> DataFrame:
    """Re-aggregate a finer rollup's partials to a coarser grain — never
    touches the raw table."""
    return (
        finer.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
        .groupBy("bucket", *dims)
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.sum("n").alias("n"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_hierarchy(
    df: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Full hierarchy as one DataFrame: a `grain` tag column plus the
    bucket, dims, partials, and the derived avg. Each grain is built from
    the previous one; the raw table is scanned exactly once."""
    levels = []
    cur = rollup_finest(df, ts_col, dims, value_col, grains[0])
    levels.append((grains[0], cur))
    for g in grains[1:]:
        cur = rollup_coarser(cur, g, dims)
        levels.append((g, cur))
    out = None
    for g, lvl in levels:
        tagged = lvl.select(
            F.lit(g).alias("grain"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            *dims,
            F.round("sum_value", 6).alias("sum_value"),
            F.col("n").alias("n"),
            F.col("min_value"),
            F.col("max_value"),
            F.round(F.col("sum_value") / F.col("n"), 6).alias("avg_value"),
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out
