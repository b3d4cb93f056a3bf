"""Wave-36 mechanism tests: the session-merge replay must actually
contain sessions that STRADDLE the shard cut (otherwise the cross-batch
merge path never runs), and the shoelace query's winding sign must be
consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_sessions_straddle_the_shard_cut(spark, sf_dir):
    out = SPECS["stream_session_merge_batches"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    cut_s = cut.strftime("%Y-%m-%d %H:%M:%S")
    straddling = out.where(
        (F.col("session_start") < cut_s) & (F.col("session_end") > cut_s)
    ).count()
    assert straddling > 0, "no session crosses the cut — merge never exercised"


def test_shoelace_winding_is_ccw(spark, sf_dir):
    out = SPECS["geo_polygon_area_centroid"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "no polygons"
    # The star 8-gon generator winds counter-clockwise: signed doubled
    # area must be positive for every polygon, and area consistent.
    for r in rows:
        assert r["twice_area"] > 0
        assert abs(r["area"] - r["twice_area"] / 2.0) < 1e-6
