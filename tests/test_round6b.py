"""Round-6 second wave: statistical / ranking-eval / iterative query
properties and plan-shape pins. Value-level correctness vs DuckDB is
covered by tests/test_oracle.py; these assert the semantic invariants a
hash match alone can't express (metric bounds, monotonicity, plan
shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_mann_whitney_bounds_and_windowless(spark, sf_dir):
    """U/(n1*n2) is the AUC — must be in [0,1]; z finite; and the whole
    rank computation must run with ZERO window operators (the point of
    the per-value-count construction)."""
    df = SPECS["stat_mann_whitney"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    row = df.collect()[0]
    assert 0.0 <= row["auc"] <= 1.0
    assert row["u2"] % 1 == 0 and 0 <= row["u2"] <= 2 * row["n1"] * row["n2"]


def test_welch_consistent_with_mann_whitney_direction(spark, sf_dir):
    """Two different two-sample tests on the same populations must agree
    on the direction of the location shift (or both be ~null)."""
    mw = SPECS["stat_mann_whitney"].fn(spark, sf_dir).collect()[0]
    wt = SPECS["stat_welch_ttest"].fn(spark, sf_dir).collect()[0]
    if abs(wt["t_stat"]) > 2 and abs(mw["z"]) > 2:
        assert (wt["t_stat"] > 0) == (mw["auc"] > 0.5)


def test_ndcg_bounds_and_group_limit(spark, sf_dir):
    df = SPECS["eval_ndcg_at_k"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        if r["ndcg"] is not None:
            assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["dcg_micro"] <= r["idcg_micro"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rank<=k compiled to partial top-k


def test_pr_at_k_bounds(spark, sf_dir):
    rows = SPECS["eval_pr_at_k"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits"] <= 5
        assert r["hits"] <= r["rel_total"]
        assert abs(r["precision_at_5"] - r["hits"] / 5.0) < 1e-9
        if r["rel_total"] == 0:
            assert r["recall_at_5"] is None
        else:
            assert 0.0 <= r["recall_at_5"] <= 1.0


def test_label_propagation_labels_are_vertices(spark, sf_dir):
    """Every community id must itself be a member vertex of the graph,
    and every vertex gets exactly one label."""
    df = SPECS["graph_label_propagation"].fn(spark, sf_dir)
    out = df.collect()
    vertices = {r["user_id"] for r in out}
    assert len(out) == len(vertices)  # one label per vertex
    assert {r["community"] for r in out} <= vertices
    # propagation must coarsen: strictly fewer communities than vertices
    assert len({r["community"] for r in out}) < len(vertices)


def test_acf_bounds_and_lag7_weekly_peak(spark, sf_dir):
    rows = SPECS["ts_acf"].fn(spark, sf_dir).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6


def test_logreg_gd_beats_chance_and_bounded_driver_state(spark, sf_dir):
    """The trained linear rule must beat the majority-class rate on the
    training set (GD on a separable-ish signal) — a property the hash
    match can't express."""
    row = SPECS["ml_logreg_gd"].fn(spark, sf_dir).collect()[0]
    acc = row["n_correct"] / row["n"]
    from etl_caic_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pos = li.filter(F.col("l_returnflag") == "R").count() / li.count()
    assert acc >= max(pos, 1 - pos) - 1e-9
    assert all(abs(row[f"w{j}"]) < 100 for j in range(3))


def test_rag_chunk_index_topk_ordered(spark, sf_dir):
    df = SPECS["rag_chunk_index"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan  # global top-k never full-sorts
