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

# Round-5 session-2 recuration: the 22 queries ADDED this session lead
# (retrieval/Zipf, basket rules, naive Bayes + PCA power, privacy trio,
# SNM linkage + entity resolution, seasonal/churn/business-days TS,
# snapshot diff / attribution / calendar / RFM / freshness, graph
# reciprocity) — every one must get its first driver row; next come the
# r4-changed set the driver has still never re-verified (flagship,
# sampling, LSH scale config, salted join, BMP codec, portable MinHash)
# and the never-sampled flagships; the remaining slots keep one
# representative per still-unsampled family. Displaced (all green in the
# identical local oracle run, tests/test_oracle.py, rotating back next
# round): join_aqe_skew, eval_regression_metrics, feat_target_encode_loo,
# text_word_entropy, text_vocab_coverage, dq_volume_anomaly,
# graph_jaccard_links, multimodal_patchify, lakehouse_partition_evolution,
# agg_distinct_filter, geo_quadkey_rollup, agg_filter_clause,
# subquery_not_in_nulls, geo_grid_join, ts_retention_cohorts,
# sink_partition_overwrite, stat_linreg_group,
# scan_dynamic_partition_pruning, lakehouse_delete_vectors,
# sample_weighted_topk, text_bigram_logprob, graph_sssp_weighted,
# rollup_timeseries, geo_point_in_polygon, join_bucketed,
# stream_outer_join, text_span_dedup (displaced by the wave-4
# additions scan_keyset_pagination / dq_key_skew / scd2_bitemporal /
# geo_trajectory_stats / token_bucket_padding);
# scan_parquet_corrupt_tolerance, cdc_apply_changes,
# lakehouse_stats_skipping (displaced by the wave-5 additions
# stat_ks_two_sample / stat_psi_drift / feature_store_customer —
# their families stay represented by scan_keyset_pagination,
# stream_cdc_merge + snapshot_diff, and scd2_bitemporal).
# Waves 6-7 additions (attrib_linear_multi_touch, sim_range_search,
# link_snm_distributed, feat_quantile_normalize, geo_dbscan_core,
# ts_anomaly_deseasonal) stay OUTSIDE the window this round — every
# one of their families already has an in-window representative —
# and lead the round-6 rotation.
_DRIVER_WINDOW = [
    # new this session — first driver verification
    "text_bm25_topk",
    "text_pmi_bigrams",
    "dedup_containment",
    "text_zipf_fit",
    "basket_assoc_rules",
    "ml_nb_train",
    "ml_nb_classify",
    "embed_pca_power",
    "priv_k_anonymity",
    "priv_pseudonymize",
    "priv_dp_noisy_counts",
    "link_sorted_neighborhood",
    "link_entity_resolution",
    "ts_seasonal_decompose",
    "ts_churn_label",
    "ts_business_days",
    "snapshot_diff",
    "attrib_last_touch",
    "dim_calendar_rollup",
    "cust_rfm_segments",
    "dq_freshness",
    "graph_reciprocity",
    # changed in round 4/5 — driver must (re-)verify
    "caic_pipeline",
    "sample_fraction",
    "sample_stratified",
    "sim_lsh_cosine",
    "join_salted_skew",
    "multimodal_bmp_codec",
    "dedup_minhash_md5",
    # never-sampled flagships
    "corpus_curation_pipeline",
    "graph_pagerank",
    "clickstream_pipeline",
    "mm_training_prep_pipeline",
    # one representative per never-sampled family
    "agg_bitmap_distinct",
    "tpch_q21_shape",
    "stat_psi_drift",
    "stream_cdc_merge",
    "feature_store_customer",
    "sink_python_datasource",
    "stat_ks_two_sample",
    "dq_key_skew",
    "scan_keyset_pagination",
    "subquery_lateral_topn",
    "scd2_bitemporal",
    "geo_trajectory_stats",
    "eval_auc_exact",
    "feat_bin_quantile",
    "sketch_kmv_distinct",
    "token_bucket_padding",
    # dq family is represented by the new dq_freshness above;
    # dq_constraint_suite rotates next round in its place
    "mv_join_incremental",
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
