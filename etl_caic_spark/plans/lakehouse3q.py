"""Wave 26 (round 5): two more table-format/ops mechanisms — partition
SPEC EVOLUTION (legacy unpartitioned files coexisting with a new
hive-partitioned layout under one logical table) and corrupt-file
tolerant scans (ignoreCorruptFiles) — the operational realities of a
table that has lived long enough to change layout and to suffer a bad
writer.

Proof style follows lakehouse_log_replay: the Spark query derives the
answer THROUGH the mechanism over deterministic scratch files; the
DuckDB oracle states the expected visible rows declaratively; a hash
match proves the mechanism selected exactly the right data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path


@register(
    "lakehouse_partition_evolution",
    oracle="""
    SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS yr,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scan", "lakehouse", "scale"),
)
def lakehouse_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution (Iceberg's headline feature, replayed
    mechanically): the table's OLD half lives as legacy UNPARTITIONED
    parquet files (no directory keys — the year must be derived from
    the data), its NEW half is hive-partitioned by yr=<year> (the year
    comes from the directory, is absent from the files, and enables
    partition pruning). A reader must union the two layouts under one
    schema without rewriting history. The split is deterministic
    (orderkey parity), the two reads are aligned with unionByName, and
    the oracle aggregates the raw table — the hash match proves no row
    was lost, duplicated, or mis-yeared across the spec change.

    Scale: this is why spec evolution matters at 100 TB — the legacy
    data is NEVER rewritten; new queries get directory pruning on new
    data and predicate pushdown on old. The derived-column branch costs
    one projection; tests/test_lakehouse3.py asserts the partitioned
    branch prunes directories for a single-year predicate."""
    base = scratch_path("lakehouse_evolution_orders")
    legacy_dir = os.path.join(base, "legacy")
    part_dir = os.path.join(base, "partitioned")
    src = load_table(spark, sf_dir, "orders")
    old = src.where(F.col("o_orderkey") % 2 == 0)
    new = src.where(F.col("o_orderkey") % 2 == 1)
    old.write.mode("overwrite").parquet(legacy_dir)
    new.withColumn(
        "yr", F.year("o_orderdate").cast("int")
    ).write.mode("overwrite").partitionBy("yr").parquet(part_dir)

    legacy = spark.read.parquet(legacy_dir).withColumn(
        "yr", F.year("o_orderdate").cast("int")
    )
    evolved = spark.read.parquet(part_dir).withColumn(
        "yr", F.col("yr").cast("int")
    )
    unified = legacy.unionByName(evolved.select(*legacy.columns))
    return unified.groupBy("yr", "o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )


@register(
    "scan_parquet_corrupt_tolerance",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE event_id % 5 <> 0
    GROUP BY 1
    """,
    tags=("scan", "dq", "format"),
)
def scan_parquet_corrupt_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-file-tolerant scan: the good rows (event_id % 5 ≠ 0) are
    written as 4 healthy parquet shards; a fifth '.parquet' file is
    GARBAGE BYTES (a truncated/overwritten write — the classic failed-
    writer artifact). Reading the directory with ignoreCorruptFiles
    skips the bad file instead of failing the job; the oracle states
    the healthy rows declaratively, so the hash match proves exactly
    the corrupt file (and nothing else) was dropped. The companion
    default-mode behavior — the same read FAILING loudly without the
    option — is pinned in tests/test_lakehouse3.py, because silently
    tolerating corruption must be an explicit choice.

    Scale: the skip decision is per-file at footer-read time, so a
    100 TB scan pays nothing for the option on healthy files; paired
    with an audit query over _metadata.file_path counts it becomes the
    quarantine-and-alert pattern (scan_jsonl_corrupt's binary cousin)."""
    base = scratch_path("corrupt_scan_events")
    shutil.rmtree(base, ignore_errors=True)
    src = load_table(spark, sf_dir, "events")
    good = src.where(F.col("event_id") % 5 != 0)
    good.repartition(4).write.mode("overwrite").parquet(base)
    # Plant the corrupt member AFTER the healthy write committed.
    with open(os.path.join(base, "part-corrupt-00000.parquet"), "wb") as f:
        f.write(b"PAR1" + b"\x00\xde\xad\xbe\xef" * 64)  # bogus body, no footer
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(base)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("event_id").cast("bigint").alias("min_id"),
            F.max("event_id").cast("bigint").alias("max_id"),
        )
    )
