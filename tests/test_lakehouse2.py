"""Mechanism tests for the wave-13 lakehouse queries: stats skipping must
actually skip files (not just produce the right answer), and deletion
vectors must remove exactly the tombstoned physical rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_caic_spark.plans.lakehouse2q import _BAND, pruned_file_count
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

SPECS = all_specs()


def test_stats_skipping_prunes_6_of_8_files(spark, sf_dir):
    # The registered predicate [150k, 220k) intersects exactly bands 2,3.
    assert pruned_file_count(sf_dir, 150_000.0, 220_000.0) == (2, 8)
    # Run the query, then re-derive the pruning from the on-disk stats:
    # only 2 band files intersect the range.
    SPECS["lakehouse_stats_skipping"].fn(spark, sf_dir).collect()
    base = scratch_path("lakehouse_stats_orders")
    files = sorted(d for d in os.listdir(base) if d.startswith("f"))
    assert len(files) == 8
    survivors = []
    for f in files:
        df = spark.read.parquet(os.path.join(base, f))
        mn, mx = df.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
        if mx >= 150_000.0 and mn < 220_000.0:
            survivors.append(f)
    assert survivors == ["f2", "f3"]
    # sanity: the band layout really is disjoint by _BAND
    assert _BAND * 8 >= 499_979


def test_delete_vectors_remove_exact_rows(spark, sf_dir):
    out = SPECS["lakehouse_delete_vectors"].fn(spark, sf_dir)
    visible = out.agg(F.sum("n")).first()[0]
    o = load_table(spark, sf_dir, "orders")
    expected = o.filter(
        ~((F.col("o_orderkey") % 7 == 3) & (F.col("o_orderstatus") == "F"))
    ).count()
    assert visible == expected
    deleted = o.count() - expected
    assert deleted > 0, "the DV must actually tombstone something"


def test_write_banded_layout_tolerates_empty_band(spark, tmp_path):
    # r16 (r15 ADVICE items 1/4): a band that receives no rows must land
    # as an empty parquet file (the old per-band filtered write's
    # behavior), not an AssertionError; out-of-range band values must
    # fail loudly with the offending names.
    from etl_caic_spark.plans.lakehouse2q import write_banded_layout

    src = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("k")
    )
    base = str(tmp_path / "banded")
    # bands f0/f1 populated, f2/f3 empty
    write_banded_layout(src, F.concat(F.lit("f"), "k"), base, 4)
    for name, want in [("f0", 5), ("f1", 5), ("f2", 0), ("f3", 0)]:
        df = spark.read.parquet(os.path.join(base, name))
        assert df.count() == want
        assert df.columns == ["id", "k"]
    # an out-of-range band name fails loudly
    import pytest

    with pytest.raises(AssertionError, match="f9"):
        write_banded_layout(src, F.lit("f9"), str(tmp_path / "bad"), 2)
