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
