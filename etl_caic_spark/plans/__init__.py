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

# Round-6 rotation: burn down the never-driver-verified debt,
# heaviest-first per the round-5 verdict. The window leads with the
# 20 TPC-H shapes that have never had a driver row (q21 went green in
# r5), then the never-verified multimodal family (gif codec, frames,
# wav features, image stats, tar shards, patchify, audio decimate),
# the full lakehouse family, the wave-6/7 additions promised this
# rotation (attrib_linear_multi_touch, sim_range_search,
# link_snm_distributed, feat_quantile_normalize, geo_dbscan_core,
# ts_anomaly_deseasonal), the four NEW scale-safe window twins
# (plans/scalewinq.py) plus the two queries whose semantics changed
# this round and therefore need re-verification (dq_sequence_gaps now
# audits the 'F'-status slice; geo_trajectory_stats bbox now includes
# first points), the remaining exact twins of the rows-only approx
# family (sim_topk_ivf_exact, dedup_simhash_md5), and three heavy
# never-verified representatives (agg_grouping_sets, win_gaps_islands,
# udf_batch_inference). Every r5-window query went green and rotates
# out; r1-r5 cumulative driver-green is preserved in the CORRECTNESS
# artifacts.
_DRIVER_WINDOW = [
    # TPC-H shapes — 20 never-verified (q2/q9/q17/q20 called out by the
    # round-5 verdict)
    "tpch_q2_shape",
    "tpch_q3_shape",
    "tpch_q4_shape",
    "tpch_q5_shape",
    "tpch_q6_shape",
    "tpch_q7_shape",
    "tpch_q8_shape",
    "tpch_q9_shape",
    "tpch_q10_shape",
    "tpch_q11_shape",
    "tpch_q12_shape",
    "tpch_q13_shape",
    "tpch_q14_shape",
    "tpch_q15_shape",
    "tpch_q16_shape",
    "tpch_q17_shape",
    "tpch_q18_shape",
    "tpch_q19_shape",
    "tpch_q20_shape",
    "tpch_q22_shape",
    # multimodal family — never verified
    "multimodal_gif_codec",
    "multimodal_frames",
    "multimodal_wav_features",
    "multimodal_image_stats",
    "multimodal_tar_shards",
    "multimodal_patchify",
    "multimodal_audio_decimate",
    # lakehouse family — never verified
    "lakehouse_log_replay",
    "lakehouse_time_travel",
    "lakehouse_stats_skipping",
    "lakehouse_delete_vectors",
    "lakehouse_vacuum",
    "lakehouse_partition_evolution",
    # wave-6/7 additions promised for this rotation
    "attrib_linear_multi_touch",
    "sim_range_search",
    "link_snm_distributed",
    "feat_quantile_normalize",
    "geo_dbscan_core",
    "ts_anomaly_deseasonal",
    # new scale-safe twins + semantics-changed queries (re-verify)
    "feat_bin_quantile_dist",
    "feat_quantile_normalize_dist",
    "dq_sequence_gaps_dist",
    "stat_ks_binned",
    "dq_sequence_gaps",
    "geo_trajectory_stats",
    # exact twins of the rows-only approx family still without a row
    "sim_topk_ivf_exact",
    "dedup_simhash_md5",
    # heavy never-verified representatives
    "agg_grouping_sets",
    "win_gaps_islands",
    "udf_batch_inference",
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
