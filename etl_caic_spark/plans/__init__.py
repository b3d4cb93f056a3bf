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

# Round-8 rotation (r7 verdict ask #1): burn down the 178-query
# never-driver-verified debt, heaviest-evidence-gap first. The window is
# exactly the judge's prescription: the entire round6b/c/d stats/ML/graph
# wave (24 — includes the two r7-semantics-changed queries
# graph_label_propagation and stat_bootstrap_ci whose r6 driver rows are
# stale, and stat_permutation_test whose hashmix + integer-division fix
# lands this round), then relational2 (9 — includes agg_percentile_exact,
# the last rows-only twin without a driver row, r7 ask #6), relational7
# (9), and the formats family (8). 24+9+9+8 = 50, all never verified by
# the driver before this round. Every r6/r7-window query went green twice
# (driver + judge replay) and rotates out; r1-r7 cumulative driver-green
# (195 names) is preserved in the CORRECTNESS artifacts.
_DRIVER_WINDOW = [
    # round6b — never verified; graph_label_propagation re-derived in r7
    "stat_mann_whitney",
    "stat_welch_ttest",
    "eval_ndcg_at_k",
    "eval_pr_at_k",
    "graph_label_propagation",
    "ts_acf",
    "ml_logreg_gd",
    "rag_chunk_index",
    # round6c — never verified; stat_bootstrap_ci got the hashmix in r7
    "stat_jarque_bera",
    "stat_mutual_info",
    "stat_cramers_v",
    "stat_bootstrap_ci",
    "ts_crosscorr",
    "ts_cusum_changepoint",
    "ml_ols_multi",
    "ml_decision_stump",
    "rag_mmr_rerank",
    # round6d — never verified; stat_permutation_test changes this round
    "rec_item_knn",
    "graph_modularity",
    "feat_woe_iv",
    "ml_knn_classify",
    "attrib_position_based",
    "stat_permutation_test",
    "ts_theil_sen",
    # relational2 — never verified (incl. agg_percentile_exact, the
    # exact twin of the approx-percentile rows-only family)
    "pivot_wide",
    "unpivot_long",
    "agg_stats",
    "agg_approx_quantile",
    "agg_string_agg",
    "subquery_scalar",
    "win_distribution",
    "agg_percentile_exact",
    "fn_regexp",
    # relational7 — never verified
    "profile_summary",
    "stat_crosstab",
    "fn_null_handling",
    "fn_try_ops",
    "explode_outer_nulls",
    "agg_mode",
    "dq_referential_integrity",
    "agg_corr_exact_moments",
    "fn_bitagg",
    # formats — never verified
    "scan_partition_pruned",
    "scan_schema_evolution",
    "sink_xml_roundtrip",
    "sink_text_roundtrip",
    "source_python_datasource",
    "scan_csv_malformed",
    "sink_partition_overwrite",
    "scan_dynamic_partition_pruning",
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
