"""Partition pruning must be visible in the physical plan: the year filter
becomes PartitionFilters on the file scan (directories pruned before IO)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path


def test_partition_pruning_in_plan(spark, sf_dir):
    all_specs()["scan_partition_pruned"].fn(spark, sf_dir)  # writes the layout
    part = spark.read.parquet(scratch_path("orders_by_year"))
    pruned = part.filter(F.col("o_year").isin(1996, 1997)).select("o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # pruning actually reduces files read: scan all years vs two years
    n_all = part.select("o_year").distinct().count()
    assert n_all > 2, "fixture spans more than two years"


def test_roundtrips_preserve_rowcount(spark, sf_dir):
    src_n = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 19 == 0)
        .count()
    )
    for name in ("sink_csv_roundtrip", "sink_jsonl_roundtrip", "sink_orc_roundtrip"):
        assert all_specs()[name].fn(spark, sf_dir).count() == src_n, name


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    from etl_caic_spark.registry import all_specs

    df = all_specs()["scan_dynamic_partition_pruning"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact scan's PartitionFilters must carry the join-driven
    # dynamicpruning subquery — directory-level IO skipping at run time
    assert "dynamicpruningexpression" in plan
    assert "dynamicpruning#" in plan


def test_jsonl_writer_two_phase_commit(tmp_path):
    """The writer's commit protocol, exercised directly: data is invisible
    until commit() promotes the temp file; abort() leaves nothing."""
    import os

    from pyspark.sql import types as T

    from etl_caic_spark.sources.pyds import JsonlWriter

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    path = str(tmp_path / "out")

    w = JsonlWriter({"path": path}, schema, overwrite=False)
    msg = w.write(iter([(1, "x"), (2, "y")]))
    assert os.path.exists(msg.tmp) and not os.path.exists(msg.final)
    assert msg.rows == 2
    w.commit([msg])
    assert os.path.exists(msg.final) and not os.path.exists(msg.tmp)
    with open(msg.final) as fh:
        assert fh.read() == '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n'

    m2 = w.write(iter([(3, "z")]))
    w.abort([m2])
    assert not os.path.exists(m2.tmp)
    # the committed file from the first job is untouched by the abort
    assert os.path.exists(msg.final)
