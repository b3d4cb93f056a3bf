"""Plan registry package.

Importing this package registers every named query (SURVEY.md §2.C) into
:mod:`etl_caic_spark.registry`. Modules are grouped by milestone surface.

The round driver's CORRECTNESS run covers the FIRST 50 queries in
registration order, so `_DRIVER_WINDOW` pins that window explicitly:
each round it leads with the families that still need a driver-green row
(round 2: streaming, UDFs, text/LLM ops, multimodal, sinks, the flagship,
and the re-worked array-output queries), plus a small representative
subset of the already-green relational core as a regression canary.
Everything else keeps its import-order position after the window and
rotates in on later rounds.
"""

from etl_caic_spark.registry import REGISTRY, QuerySpec, all_specs  # noqa: F401

from etl_caic_spark.plans import relational  # noqa: F401,E402
from etl_caic_spark.plans import scalar  # noqa: F401,E402
from etl_caic_spark.plans import windows  # noqa: F401,E402
from etl_caic_spark.plans import llm  # noqa: F401,E402
from etl_caic_spark.plans import udfq  # noqa: F401,E402
from etl_caic_spark.plans import streamingq  # noqa: F401,E402
from etl_caic_spark.plans import caicq  # noqa: F401,E402
from etl_caic_spark.plans import multimodalq  # noqa: F401,E402
from etl_caic_spark.plans import relational2  # noqa: F401,E402
from etl_caic_spark.plans import relational3  # noqa: F401,E402
from etl_caic_spark.plans import relational4  # noqa: F401,E402
from etl_caic_spark.plans import relational5  # noqa: F401,E402
from etl_caic_spark.plans import formats  # noqa: F401,E402
from etl_caic_spark.plans import relational6  # noqa: F401,E402
from etl_caic_spark.plans import sampling  # noqa: F401,E402
from etl_caic_spark.plans import pipelineq  # noqa: F401,E402
from etl_caic_spark.plans import relational7  # noqa: F401,E402
from etl_caic_spark.plans import llm2  # noqa: F401,E402
from etl_caic_spark.plans import timeseriesq  # noqa: F401,E402
from etl_caic_spark.plans import llm3  # noqa: F401,E402
from etl_caic_spark.plans import graphq  # noqa: F401,E402
from etl_caic_spark.plans import scaleq  # noqa: F401,E402
from etl_caic_spark.plans import curationq  # noqa: F401,E402
from etl_caic_spark.plans import featuresq  # noqa: F401,E402
from etl_caic_spark.plans import multimodalq2  # noqa: F401,E402
from etl_caic_spark.plans import llm4  # noqa: F401,E402
from etl_caic_spark.plans import relational8  # noqa: F401,E402
from etl_caic_spark.plans import geoq  # noqa: F401,E402
from etl_caic_spark.plans import sketchq  # noqa: F401,E402
from etl_caic_spark.plans import relational9  # noqa: F401,E402
from etl_caic_spark.plans import relational10  # noqa: F401,E402
from etl_caic_spark.plans import llm5  # noqa: F401,E402
from etl_caic_spark.plans import tpchq  # noqa: F401,E402
from etl_caic_spark.plans import regressionq  # noqa: F401,E402
from etl_caic_spark.plans import lakehouse2q  # noqa: F401,E402
from etl_caic_spark.plans import analytics2q  # noqa: F401,E402
from etl_caic_spark.plans import sketch2q  # noqa: F401,E402
from etl_caic_spark.plans import geo2q  # noqa: F401,E402
from etl_caic_spark.plans import clickstreamq  # noqa: F401,E402
from etl_caic_spark.plans import tokenq  # noqa: F401,E402
from etl_caic_spark.plans import webdatasetq  # noqa: F401,E402
from etl_caic_spark.plans import mlq  # noqa: F401,E402
from etl_caic_spark.plans import llm6  # noqa: F401,E402
from etl_caic_spark.plans import analytics3q  # noqa: F401,E402
from etl_caic_spark.plans import graph2q  # noqa: F401,E402
from etl_caic_spark.plans import multimodalq3  # noqa: F401,E402
from etl_caic_spark.plans import streaming2q  # noqa: F401,E402
from etl_caic_spark.plans import lakehouse3q  # noqa: F401,E402
from etl_caic_spark.plans import relational11  # noqa: F401,E402
from etl_caic_spark.plans import geo3q  # noqa: F401,E402
from etl_caic_spark.plans import mlq2  # noqa: F401,E402
from etl_caic_spark.plans import relational12  # noqa: F401,E402
from etl_caic_spark.plans import analytics4q  # noqa: F401,E402
from etl_caic_spark.plans import mlq3  # noqa: F401,E402
from etl_caic_spark.plans import relational13  # noqa: F401,E402
from etl_caic_spark.plans import mmprepq  # noqa: F401,E402
from etl_caic_spark.plans import relational14  # noqa: F401,E402
from etl_caic_spark.plans import layoutq  # noqa: F401,E402
from etl_caic_spark.plans import streaming3q  # noqa: F401,E402
from etl_caic_spark.plans import aqeq  # noqa: F401,E402
from etl_caic_spark.plans import geo4q  # noqa: F401,E402
from etl_caic_spark.plans import streaming4q  # noqa: F401,E402
from etl_caic_spark.plans import relational15  # noqa: F401,E402
from etl_caic_spark.plans import llm7  # noqa: F401,E402
from etl_caic_spark.plans import retrievalq  # noqa: F401,E402
from etl_caic_spark.plans import basketq  # noqa: F401,E402
from etl_caic_spark.plans import mlq4  # noqa: F401,E402
from etl_caic_spark.plans import privacyq  # noqa: F401,E402
from etl_caic_spark.plans import linkageq  # noqa: F401,E402
from etl_caic_spark.plans import timeseries2q  # noqa: F401,E402
from etl_caic_spark.plans import analytics5q  # noqa: F401,E402
from etl_caic_spark.plans import warehouseq  # noqa: F401,E402
from etl_caic_spark.plans import driftq  # noqa: F401,E402
from etl_caic_spark.plans import featurestoreq  # noqa: F401,E402
from etl_caic_spark.plans import llm8  # noqa: F401,E402
from etl_caic_spark.plans import scalewinq  # noqa: F401,E402
from etl_caic_spark.plans import round6q  # noqa: F401,E402
from etl_caic_spark.plans import round6b  # noqa: F401,E402
from etl_caic_spark.plans import round6c  # noqa: F401,E402
from etl_caic_spark.plans import round6d  # noqa: F401,E402
from etl_caic_spark.plans import curation2q  # noqa: F401,E402
from etl_caic_spark.plans import sketch3q  # noqa: F401,E402
from etl_caic_spark.plans import wave8b  # noqa: F401,E402
from etl_caic_spark.plans import wave8c  # noqa: F401,E402
from etl_caic_spark.plans import wave8d  # noqa: F401,E402
from etl_caic_spark.plans import wave8e  # noqa: F401,E402
from etl_caic_spark.plans import wave8f  # noqa: F401,E402
from etl_caic_spark.plans import wave8g  # noqa: F401,E402
from etl_caic_spark.plans import wave8h  # noqa: F401,E402
from etl_caic_spark.plans import wave8i  # noqa: F401,E402
from etl_caic_spark.plans import wave8j  # noqa: F401,E402
from etl_caic_spark.plans import wave8k  # noqa: F401,E402
from etl_caic_spark.plans import wave9a  # noqa: F401,E402
from etl_caic_spark.plans import wave9b  # noqa: F401,E402
from etl_caic_spark.plans import wave9c  # noqa: F401,E402
from etl_caic_spark.plans import wave9d  # noqa: F401,E402
from etl_caic_spark.plans import wave10a  # noqa: F401,E402
from etl_caic_spark.plans import wave10b  # noqa: F401,E402
from etl_caic_spark.plans import wave10c  # noqa: F401,E402
from etl_caic_spark.plans import wave11a  # noqa: F401,E402
from etl_caic_spark.plans import wave11b  # noqa: F401,E402
from etl_caic_spark.plans import wave12a  # noqa: F401,E402
from etl_caic_spark.plans import wave12b  # noqa: F401,E402
from etl_caic_spark.plans import wave13a  # noqa: F401,E402
from etl_caic_spark.plans import wave13b  # noqa: F401,E402
from etl_caic_spark.plans import wave14a  # noqa: F401,E402
from etl_caic_spark.plans import wave14b  # noqa: F401,E402
from etl_caic_spark.plans import wave14c  # noqa: F401,E402
from etl_caic_spark.plans import wave14d  # noqa: F401,E402
from etl_caic_spark.plans import wave14e  # noqa: F401,E402
from etl_caic_spark.plans import wave14f  # noqa: F401,E402

# Round-10 rotation (r9 verdict asks #1/#2/#3), never-verified-first:
# all 24 round-9 additions (wave9a-wave13b - the newest semantics, and
# graph_connected_components / dedup_cluster_canonical /
# dedup_semantic_embedding carry the round-10 pointer-doubling fix),
# the 3 outstanding stream_* names (closing the r8 "all stream rows by
# r10" deadline), the in-place win_pareto_cut rewrite (ask #2 requires
# a driver row for the new prefix-construction plan), the two round-10
# ANN recall audits (ask #3), then relational9 (5), relational10 (5),
# scaleq (5), analytics2q (4) and the first of round6q.
# 24+3+1+2+5+5+5+4+1 = 50. Every r9-window query went green twice
# (driver + judge replay) and rotates out; the r1-r9 cumulative
# driver-green set (284 hash + 6 rows-only names) is preserved in the
# CORRECTNESS artifacts.
_DRIVER_WINDOW = [
    # wave9a-wave13b - the full round-9 surface
    "stat_kendall_tau",
    "stat_kruskal_wallis",
    "ml_naive_bayes",
    "eval_brier_logloss",
    "graph_connected_components",
    "dedup_cluster_canonical",
    "stat_anova_f",
    "eval_mcc",
    "sim_pq_adc",
    "data_curriculum_order",
    "stat_levene",
    "feat_impute_median_group",
    "ml_boosted_stumps",
    "multimodal_tiff_codec",
    "scan_fixed_width",
    "sink_compressed_roundtrip",
    "eval_krippendorff_alpha",
    "dedup_semantic_embedding",
    "eval_ece",
    "stat_friedman",
    "eval_rouge_corpus",
    "data_pii_scrub",
    "text_ngram_novelty",
    "eval_pass_at_k",
    # the last stream_* names without a driver row (r8 deadline)
    "stream_outer_join",
    "stream_multi_batch_window",
    "stream_session_merge_batches",
    # round-10 work: the pareto rewrite + the ANN recall audits
    "win_pareto_cut",
    "eval_pq_recall",
    "eval_ivf_recall",
    # relational9 - never verified
    "merge_full",
    "join_asof_nearest",
    "win_sliding_distinct",
    "join_interval_overlap",
    "agg_decimal_exact",
    # relational10 - never verified
    "graph_degree_topk",
    "ts_resample_ohlc",
    "ts_ewma",
    "feat_target_encode",
    "feat_scale_robust",
    # scaleq - never verified
    "agg_salted_skew",
    "join_bucketed",
    "compact_small_files",
    "layout_zorder",
    "join_shuffle_hash",
    # analytics2q - never verified
    "graph_sssp_weighted",
    "geo_haversine_knn",
    "agg_skew_kurtosis",
    "dq_constraint_suite",
    # round6q - never verified (first of four; rest next round)
    "agg_median_selection",
]


def _apply_driver_window() -> None:
    assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW:
        ordered[name] = REGISTRY[name]  # KeyError on a typo — fail loudly
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
