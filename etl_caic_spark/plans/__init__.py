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
from etl_caic_spark.plans import wave15a  # noqa: F401,E402

# Round-11 rotation (r10 verdict ask #1), never-verified-first:
# geo + sketch lead (r9 ask #4 HARD DEADLINE: every geo_* / sketch_*
# name has a driver row by r11; agg_hll_sketch rides along as the one
# sketch-family rows-only name without any driver row), then the 7
# round-10 additions (newest semantics), subquery (3), udf (2),
# graph (5), and the largest remaining singles pools: scan (6),
# text (9), win (4), dedup (4) and json_variant.
# 4+5+7+3+2+5+6+9+4+4+1 = 50. Every r10-window query went green twice
# (driver 50/50 + judge 435-query replay) and rotates out; the r1-r10
# cumulative driver-green set (334 hash + 6 rows-only names) is
# preserved in the CORRECTNESS artifacts.
#
# ROUND-12 ENDGAME (r10 verdict ask #4) - after this window the
# never-verified pool is exactly the 45 names below plus the 5 round-11
# wave15a additions (eval_confusion_prf, eval_perplexity_heldout,
# data_dpo_pairs, agg_mode_exact, ts_changepoint_cusum) = exactly 50.
# All 50 were pre-verified hash-green by filtered tools/driver_sim.py
# runs this round (recorded in SCALE.md round 11). Pin them as the r12
# window to close the pool to zero:
#   fn_date2 fn_string2 fn_bitwise fn_map_entries fn_struct
#   fn_struct_withfield fn_collation_ci fn_uuid_surrogate fn_xml_parse
#   fn_from_csv agg_minmax_by agg_histogram agg_filter_clause
#   agg_weighted_avg agg_distinct_filter sessionize_window scd2_history
#   mv_incremental_refresh feat_winsorize anomaly_mad kfold_split
#   cdc_apply_changes stat_linreg_group stat_chi_square
#   stat_benford_digits sample_weighted_topk sample_reservoir_k
#   ts_retention_cohorts join_null_safe join_scd2_pit
#   join_aqe_broadcast_convert join_aqe_skew data_mixture_sampler
#   data_epoch_shuffle dq_volume_anomaly dq_schema_contract
#   udf_group_train_ols eval_ab_test embed_gram_matrix
#   layout_sorted_within_partitions ml_future_purchase_label
#   ml_negative_sampling cust_rfm_segments_dist attrib_time_decay
#   token_length_batches
_DRIVER_WINDOW = [
    # geo - never verified (r9 ask #4 deadline)
    "geo_point_in_polygon",
    "geo_quadkey_rollup",
    "geo_polygon_area_centroid",
    "geo_grid_join",
    # sketch - never verified (same deadline; agg_hll_sketch rows-only)
    "sketch_kmv_setops",
    "sketch_countmin_freq",
    "sketch_bloom_membership",
    "sketch_histogram_quantile",
    "agg_hll_sketch",
    # the 7 round-10 additions (wave14b-f) - newest semantics
    "eval_mrr",
    "stat_js_divergence",
    "stat_wilcoxon_signed_rank",
    "stat_kaplan_meier",
    "eval_silhouette_labels",
    "data_rendezvous_shard",
    "ts_holt_winters",
    # subquery - never verified
    "subquery_in",
    "subquery_exists_correlated",
    "subquery_not_in_nulls",
    # udf - never verified
    "udf_map_in_arrow",
    "udf_python_udtf",
    # graph - never verified
    "graph_triangles",
    "graph_bfs_hops",
    "graph_jaccard_links",
    "graph_kcore_peel",
    "graph_clustering_coeff",
    # scan - never verified
    "scan_binary_files",
    "scan_csv_dialect",
    "scan_jsonl_corrupt",
    "scan_parquet_corrupt_tolerance",
    "scan_recursive_glob",
    "scan_rest_paginated",
    # text - never verified
    "text_repetition",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_boilerplate_ngrams",
    "text_bpe_pair_counts",
    "text_span_dedup",
    "text_substring_contamination",
    "text_word_entropy",
    "text_vocab_coverage",
    # win - never verified
    "win_range_frame",
    "win_pct_change",
    "win_concurrent_sweep",
    "win_rolling_median",
    # dedup - never verified
    "url_dedup",
    "dedup_keep_best",
    "dedup_normalized_exact",
    "dedup_incremental_ingest",
    # json - never verified
    "json_variant",
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
