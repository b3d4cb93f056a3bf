"""Plan-shape assertions for the round-8 waves: the top-k queries must
compile to TakeOrderedAndProject (no global sort materializes), the
skyline sweep must be ONE window, and priv_t_closeness must carry no
unpartitioned window."""

from __future__ import annotations

import re

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_adamic_adar_topk_is_take_ordered(spark, sf_dir):
    df = SPECS["graph_adamic_adar"].fn(spark, sf_dir)
    plan = _executed(df)
    assert "TakeOrderedAndProject" in plan
    # the final top-k must not be a global Sort + CollectLimit
    assert "GlobalLimit" not in plan


def test_rrf_fused_topk_is_take_ordered(spark, sf_dir):
    df = SPECS["rag_rrf_fusion"].fn(spark, sf_dir)
    plan = _executed(df)
    assert "TakeOrderedAndProject" in plan


def test_skyline_single_window_over_cells(spark, sf_dir):
    df = SPECS["analytics_skyline"].fn(spark, sf_dir)
    plan = _executed(df)
    # exactly one window operator (the cumulative-max sweep)
    assert len(re.findall(r"\bWindow\b", plan)) == 1


def test_t_closeness_window_is_partitioned(spark, sf_dir):
    df = SPECS["priv_t_closeness"].fn(spark, sf_dir)
    plan = _executed(df)
    # every windowspecdefinition in the plan names partition columns
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "c_nationkey" in spec and "c_mktsegment" in spec, spec


def test_bpe_rounds_run_on_vocab_not_corpus(spark, sf_dir):
    # after the checkpointed top-200 vocabulary, the merge rounds' plan
    # must not rescan the documents parquet
    df = SPECS["bpe_learn_merges"].fn(spark, sf_dir)
    plan = _executed(df)
    assert "documents" not in plan.lower()
