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

# Round-9 rotation (r8 verdict asks #1/#3/#7), never-verified-first:
# all 29 round-8 queries (wave8b–8k + curation2q + sketch3q — their
# semantics are the newest, four of them were rewritten onto the
# prefix-rank construction this round, and dedup_paragraph_cdc /
# sketch_hll_distinct / data_importance_resample carry round-9 review
# fixes), then the five r1-era rows-only approx entries whose driver
# rows are two-plus rounds stale (ask #3 — re-windowed once so current
# row counts sit alongside their oracled twins' hashes), then the two
# longest never-verified families timeseriesq (6) and mlq (6), and the
# first four of the streaming family (ask #7 — the remaining stream_*
# names rotate in next round). 29+5+6+6+4 = 50. Every r8-window query
# went green twice (driver + judge replay) and rotates out; the r1–r8
# cumulative driver-green set (239 hash + 6 rows-only names) is
# preserved in the CORRECTNESS artifacts.
_DRIVER_WINDOW = [
    # wave8b–8k + curation2q + sketch3q — the full round-8 surface
    "hierarchy_flatten",
    "data_importance_resample",
    "ts_holt_linear",
    "priv_l_diversity",
    "rag_rrf_fusion",
    "graph_hits",
    "eval_bleu_corpus",
    "priv_t_closeness",
    "graph_adamic_adar",
    "eval_chrf_corpus",
    "analytics_skyline",
    "bpe_learn_merges",
    "dq_dataset_fingerprint",
    "eval_cohen_kappa",
    "analytics_gini",
    "stat_spearman",
    "graph_harmonic_centrality",
    "eval_minhash_quality",
    "ts_hysteresis_alerts",
    "data_token_budget_pack",
    "sim_tfidf_cosine_topk",
    "stat_theil_index",
    "agg_weighted_median",
    "eval_fleiss_kappa",
    "dedup_paragraph_cdc",
    "data_mixture_temperature",
    "text_perplexity_buckets",
    "quality_gopher_rules",
    "sketch_hll_distinct",
    # r1-era rows-only entries, refreshed once (r8 verdict ask #3)
    "dedup_minhash",
    "dedup_simhash",
    "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
    "agg_approx_distinct",
    # timeseriesq — never verified
    "rollup_timeseries",
    "funnel_stages",
    "ts_time_weighted_avg",
    "ts_gapfill_locf",
    "win_pattern_purchase_error",
    "ts_interpolate_linear",
    # mlq — never verified
    "eval_classification_report",
    "eval_calibration_bins",
    "eval_regression_metrics",
    "feat_onehot",
    "feat_hash_trick",
    "feat_target_encode_loo",
    # streamingq — never verified (first four; rest next round)
    "stream_dedup",
    "stream_foreach_batch",
    "stream_stateful_totals",
    "stream_python_datasource",
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
