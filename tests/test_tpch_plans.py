"""Plan-shape tests for the TPC-H completion wave (plans/tpchq.py).

Each test pins an optimizer property the query's docstring claims for the
100 TB plan — predicate pushdown reaching the scan, semi/anti join
strategies, broadcast dimension chains, no cartesian products — so a
regression in the plan (not just the answer) fails loudly at test scale.
"""

from __future__ import annotations

import pytest

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _executed_plan(spark, sf_dir, name: str) -> str:
    df = SPECS[name].fn(spark, sf_dir)
    df.count()  # force execution so AQE's final plan is available
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_is_scan_only_with_pushdown(spark, sf_dir):
    """Q6 must be joinless and push its predicates into the parquet scan."""
    df = SPECS["tpch_q6_shape"].fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in optimized, "Q6 must not contain any join"
    plan = _executed_plan(spark, sf_dir, "tpch_q6_shape")
    assert "PushedFilters: [" in plan
    # the shipdate range must reach the scan, not sit in a post-scan Filter
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed


def test_q4_exists_plans_as_left_semi(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "tpch_q4_shape")
    assert "LeftSemi" in plan


def test_q16_not_in_plans_as_broadcast_anti(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "tpch_q16_shape")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_inner_side_is_pruned(spark, sf_dir):
    """The NOT EXISTS inner side must carry the pushed date filter so the
    anti join's build side is only the recently-active custkeys."""
    df = SPECS["tpch_q22_shape"].fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in optimized
    assert "o_orderdate" in optimized
    plan = _executed_plan(spark, sf_dir, "tpch_q22_shape")
    assert "LeftAnti" in plan


def test_q2_dimension_chain_broadcasts(spark, sf_dir):
    """Supplier/nation/region/part are all broadcast; the only shuffled
    joins are the argmin join-back."""
    plan = _executed_plan(spark, sf_dir, "tpch_q2_shape")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q8_star_broadcasts_all_dimensions(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "tpch_q8_shape")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    """The ON-clause filter (vs WHERE) must retain customers with no
    qualifying orders as an explicit c_count=0 bucket."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in SPECS["tpch_q13_shape"].fn(spark, sf_dir).collect()
    }
    assert 0 in rows and rows[0] > 0


def test_q15_ties_and_single_winner_revenue(spark, sf_dir):
    """Every returned supplier carries the same (maximum) revenue — the
    tie-inclusive argmax contract that makes the result deterministic."""
    rows = SPECS["tpch_q15_shape"].fn(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r["total_cents"] for r in rows}) == 1


def test_q21_windows_over_grouped_not_self_join(spark, sf_dir):
    """Q21 must be aggregate-then-window — never a lineitem self-join."""
    df = SPECS["tpch_q21_shape"].fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in optimized
    # exactly one lineitem-orders join; a self-join would show lineitem twice
    assert optimized.lower().count("lineitem.parquet") <= 1
    plan = _executed_plan(spark, sf_dir, "tpch_q21_shape")
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q9_shape",
        "tpch_q11_shape",
        "tpch_q17_shape",
        "tpch_q20_shape",
    ],
)
def test_no_cartesian_products(spark, sf_dir, name):
    plan = _executed_plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
