"""Bucketing: co-located joins without a shuffle (SURVEY.md §7.4.6).

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both tables bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin whose children read pre-partitioned buckets — zero Exchange.
This module wraps the write/read/join pattern; tests assert the
no-Exchange property on the physical plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed managed table (bucket pruning + shuffle-free
    joins for every later query on bucket_col)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], "inner")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
