"""Pins for the round-5 batch-2 operators: the grid spatial join must
plan as an equi-join (never a cartesian/nested-loop product) and find
each qualifying pair exactly once; BFS hop labels must satisfy the
triangle property over the edge list. Value-level correctness is
covered by tests/test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_geo_grid_join_plans_equi_join(spark, sf_dir):
    df = SPECS["geo_grid_join"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the probe is a hash equi-join on the composite cell key
    assert "probe_x" in plan and "probe_y" in plan


def test_geo_grid_join_pairs_unique(spark, sf_dir):
    df = SPECS["geo_grid_join"].fn(spark, sf_dir)
    total = df.count()
    distinct = df.select("id_a", "id_b").distinct().count()
    assert total == distinct > 0
    # ordering invariant: every pair emitted once, id_a < id_b
    assert df.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_bfs_hops_triangle_property(spark, sf_dir):
    rows = SPECS["graph_bfs_hops"].fn(spark, sf_dir).collect()
    hops = {r["user_id"]: r["hops"] for r in rows}
    assert hops, "BFS reached no vertices"
    seeds = [v for v, h in hops.items() if h == 0]
    assert seeds and all(v % 29 == 0 for v in seeds)
    assert all(0 <= h <= 4 for h in hops.values())
