"""Plan-shape assertions for the wave-21..26 additions: the properties
that make these operators scale must be visible in the physical plan at
test scale, not just claimed in docstrings."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_reservoir_sample_plans_take_ordered(spark, sf_dir):
    # k-smallest-by-hash must be TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows), never a global Sort + Limit.
    df = SPECS["sample_reservoir_k"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan[:1500]


def test_target_encode_broadcasts_category_stats(spark, sf_dir):
    # The category-stats dimension (5 rows) must come back as a
    # broadcast join, not a shuffled one.
    df = SPECS["feat_target_encode_loo"].fn(spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_vocab_coverage_broadcasts_vocab(spark, sf_dir):
    df = SPECS["text_vocab_coverage"].fn(spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_multi_distinct_uses_single_expand(spark, sf_dir):
    # Catalyst's multi-distinct rewrite: one Expand feeding partial
    # aggregates — the fact table is scanned once, not once per measure.
    df = SPECS["agg_distinct_filter"].fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Expand") >= 1, plan[:1500]
    assert plan.count("Scan parquet") == 1, plan[:1500]


def test_auc_window_runs_over_distinct_scores(spark, sf_dir):
    # The rank window input must be the (model, score) aggregate, not
    # the raw row stream: a HashAggregate appears below the Window.
    df = SPECS["eval_auc_exact"].fn(spark, sf_dir)
    plan = _plan(df)
    w = plan.find("Window")
    assert w >= 0, plan[:1500]
    assert "HashAggregate" in plan[w:], "window must consume the score groups"


def test_wedge_join_inputs_are_degree_truncated(spark, sf_dir):
    # The quadratic wedge self-join must consume the K-truncated
    # neighbor lists: no node may carry more than K sampled neighbors,
    # the truncation must be NON-EMPTY (a fixed degree-cap filter
    # silently emptied this dense graph — the failure mode this pins),
    # and the reported per-pair truncated degrees must respect K.
    from pyspark.sql import functions as F

    from etl_caic_spark.plans.graph2q import _K, _build_und

    nbr, _deg = _build_und(spark, sf_dir)
    per_node = nbr.groupBy("v").count()
    assert per_node.count() > 0, "truncated adjacency must not be empty"
    assert per_node.agg(F.max("count")).first()[0] <= _K

    out = SPECS["graph_jaccard_links"].fn(spark, sf_dir)
    assert out.count() > 0, "link prediction must produce candidates"
    row = out.agg(F.max("kdeg_a"), F.max("kdeg_b")).first()
    assert max(row) <= _K

    cc = SPECS["graph_clustering_coeff"].fn(spark, sf_dir)
    assert cc.count() > 0
    assert cc.agg(F.max("kdeg")).first()[0] <= _K
