"""Mechanism tests for the wave-26 lakehouse queries: partition-spec
evolution must actually PRUNE directories on the partitioned branch, and
the corrupt-parquet scan must FAIL by default (tolerance is an explicit
opt-in) while the tolerant read drops exactly the bad file."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.util import scratch_path

SPECS = all_specs()


def test_partition_evolution_prunes_directories(spark, sf_dir):
    SPECS["lakehouse_partition_evolution"].fn(spark, sf_dir).collect()
    base = scratch_path("lakehouse_evolution_orders")
    part_dir = os.path.join(base, "partitioned")
    years = sorted(d for d in os.listdir(part_dir) if d.startswith("yr="))
    assert len(years) >= 2  # the spec change produced a real hive layout
    # A single-year predicate on the evolved branch must prune to one
    # partition directory: PartitionFilters carries the year predicate
    # and the scan's selected partition count is 1.
    one_year = int(years[0].split("=")[1])
    df = spark.read.parquet(part_dir).where(F.col("yr") == one_year)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan, plan[:2000]
    # Row-level proof: the pruned read equals the directory's own count.
    direct = spark.read.parquet(os.path.join(part_dir, years[0])).count()
    assert df.count() == direct


def test_corrupt_parquet_fails_loudly_by_default(spark, sf_dir):
    SPECS["scan_parquet_corrupt_tolerance"].fn(spark, sf_dir).collect()
    base = scratch_path("corrupt_scan_events")
    # Without the opt-in, the same directory read must raise on the
    # planted garbage member (footer parse failure).
    with pytest.raises(Exception) as ei:
        spark.read.option("ignoreCorruptFiles", "false").parquet(base).count()
    msg = str(ei.value)
    assert "corrupt" in msg.lower() or "footer" in msg.lower() or "Parquet" in msg


def test_corrupt_tolerance_drops_only_the_bad_file(spark, sf_dir):
    out = SPECS["scan_parquet_corrupt_tolerance"].fn(spark, sf_dir)
    total = out.agg(F.sum("n")).first()[0]
    base = scratch_path("corrupt_scan_events")
    healthy = [
        os.path.join(base, f)
        for f in os.listdir(base)
        if f.endswith(".parquet") and "corrupt" not in f
    ]
    direct = spark.read.parquet(*healthy).count()
    assert total == direct
