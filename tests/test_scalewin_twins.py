"""The scale-safe twins (plans/scalewinq.py) must (a) return exactly the
same rows as their global-window originals and (b) carry NO
unpartitioned window in their optimized plans — the property that makes
them the 100 TB formulation. Value-level correctness vs DuckDB is also
covered by tests/test_oracle.py (they share the originals' oracles)."""

from __future__ import annotations

import re

import pytest

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


PAIRS = [
    ("feat_bin_quantile", "feat_bin_quantile_dist"),
    ("feat_quantile_normalize", "feat_quantile_normalize_dist"),
    ("dq_sequence_gaps", "dq_sequence_gaps_dist"),
    ("stat_ks_two_sample", "stat_ks_binned"),
    ("cust_rfm_segments", "cust_rfm_segments_dist"),
]


@pytest.mark.parametrize("orig,twin", PAIRS)
def test_twin_matches_original(spark, sf_dir, orig, twin):
    a = {tuple(r) for r in SPECS[orig].fn(spark, sf_dir).collect()}
    b = {tuple(r) for r in SPECS[twin].fn(spark, sf_dir).collect()}
    assert a == b, f"{twin} diverged from {orig}"


@pytest.mark.parametrize(
    "twin",
    [
        "feat_bin_quantile_dist",
        "feat_quantile_normalize_dist",
        "dq_sequence_gaps_dist",
        "cust_rfm_segments_dist",
    ],
)
def test_twin_windows_are_partitioned(spark, sf_dir, twin):
    plan = _optimized_plan(SPECS[twin].fn(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, f"{twin}: expected at least one (partitioned) window"
    for spec in specs:
        assert "_gid" in spec or "source" in spec, (
            f"{twin}: window not partitioned by a group column:\n{spec}"
        )


def test_ks_binned_has_no_window_at_all(spark, sf_dir):
    plan = _optimized_plan(SPECS["stat_ks_binned"].fn(spark, sf_dir))
    assert "windowspecdefinition" not in plan, (
        "stat_ks_binned must be windowless:\n" + plan
    )


def test_originals_still_flag_their_caveat(spark, sf_dir):
    """The anchors keep their global windows (that's their documented
    role); this pins the contrast so a refactor can't silently swap
    roles."""
    plan = _optimized_plan(SPECS["dq_sequence_gaps"].fn(spark, sf_dir))
    assert "windowspecdefinition" in plan


@pytest.mark.parametrize(
    "name",
    [
        "analytics_gini",
        "stat_spearman",
        "analytics_skyline",
        "win_pareto_cut",
    ],
)
def test_r9_rewritten_anchors_have_no_global_window(spark, sf_dir, name):
    """The r8 queries that shipped corpus/customer-grain GLOBAL rank
    windows were rewritten in-place on operators/prefix.py (r8 verdict
    ask #2), and win_pareto_cut — the last growing-grain unpartitioned
    window (r9 verdict ask #2) — joined them in round 10: every window
    in their plans must now be partitioned (by the range-partition id
    _gid), i.e. no `WindowExec: No Partition Defined` at any scale."""
    plan = _optimized_plan(SPECS[name].fn(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, f"{name}: expected at least one (partitioned) window"
    for spec in specs:
        assert "_gid" in spec, (
            f"{name}: window not partitioned by _gid:\n{spec}"
        )


def test_rrf_fusion_windows_only_over_limited_pools(spark, sf_dir):
    """r16 (wave B6): rag_rrf_fusion's pool ranks are row_number windows
    over the N-bounded candidate pools — each window must sit directly
    over a LIMITed (<= _RRF_CAND rows) subtree, never over a
    corpus-grain frame. (The previous count-smaller self-join form was
    windowless but put each pool on both sides of a BroadcastExchange,
    executing every scoring pipeline twice; this pins the replacement's
    scale property instead.)"""
    plan = _optimized_plan(SPECS["rag_rrf_fusion"].fn(spark, sf_dir))
    n_windows = plan.count("windowspecdefinition")
    assert n_windows == 2, f"expected exactly the two pool-rank windows:\n{plan}"
    # every Window node's child chain must reach a GlobalLimit before
    # any relation scan — i.e. the window input is a bounded pool
    for m in re.finditer(r"^( *)[+:]- Window ", plan, re.M):
        indent = len(m.group(1))
        rest = plan[m.end():]
        for line in rest.splitlines():
            stripped = re.match(r"( *)[+:]- (\w+)", line)
            if not stripped or len(stripped.group(1)) <= indent:
                continue
            node = stripped.group(2)
            if node == "GlobalLimit":
                break
            assert node not in ("Relation", "LogicalRDD"), (
                "window over an unlimited frame:\n" + plan
            )
        else:
            raise AssertionError("no GlobalLimit under a Window:\n" + plan)
