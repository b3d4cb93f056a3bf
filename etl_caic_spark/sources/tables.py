"""Parquet table catalog for the driver-generated synthetic tables.

Schemas documented in FIXTURES.md Part A. Reads are plain
``spark.read.parquet`` so Catalyst gets projection/predicate pushdown and
partition-sized splits for free; at 100 TB the same call reads a
multi-file dataset and ``spark.sql.files.maxPartitionBytes`` governs split
sizing — nothing here assumes a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects. Read nanos as raw INT64 and truncate to a µs TimestampType —
    exactly what DuckDB does when casting TIMESTAMP_NS → TIMESTAMP, so the
    oracle agrees. Integer DIV keeps the conversion exact (ns since epoch
    exceeds double's 2^53 mantissa)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
