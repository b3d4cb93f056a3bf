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
from etl_caic_spark.plans import wave16a  # noqa: F401,E402
from etl_caic_spark.plans import wave17a  # noqa: F401,E402
from etl_caic_spark.plans import wave17b  # noqa: F401,E402
from etl_caic_spark.plans import wave17c  # noqa: F401,E402
from etl_caic_spark.plans import wave18a  # noqa: F401,E402
from etl_caic_spark.plans import wave18b  # noqa: F401,E402
from etl_caic_spark.plans import wave18c  # noqa: F401,E402
from etl_caic_spark.plans import wave19a  # noqa: F401,E402
from etl_caic_spark.plans import wave20a  # noqa: F401,E402
from etl_caic_spark.plans import wave21a  # noqa: F401,E402
from etl_caic_spark.plans import wave22a  # noqa: F401,E402

# Round-14 rotation (r13 verdict ask #1): the window head is the 8
# round-13 additions (wave18a/b/c) that have no driver CORRECTNESS row
# yet — all 8 were pre-verified hash-green via filtered
# tools/driver_sim.py in round 13 (SCALE.md r13) AND independently
# re-verified hash-green by the r13 judge. When CORRECTNESS_r14 lands
# green, cumulative driver-verified coverage is 470/470 of the pre-r14
# registry. Four of the 8 changed shape THIS round (r13 ADVICE fixes:
# eval_quantized_recall oracle cap, decontaminate/contamination eval
# bound, tokenizer/fill micro widening, sweep df-capped truth leg) and
# were re-pre-verified hash-green at the new shape (SCALE.md r14).
# Next 4 slots: the queries whose shared connected-components operator
# changed this round (raw-pair gate + post-union vtype — output must be
# byte-identical, re-pinned to prove it). The remaining 38: the 7
# rows-only approx queries (re-confirmed each rotation since they carry
# the weaker rows-only check) and the 31 oldest-verified names (r01/r03
# era not refreshed in r13, plus the oldest r04 picks) as regression
# canaries.
#
# ROUND-16 NOTE: the wave21a additions (quality_ensemble_gate,
# eval_semdedup_agreement, data_rho_selection) and the wave22a
# additions (text_exactsubstr_removal, data_d4_prototype_prune,
# eval_bt_strength) cannot fit this window — all 6 pre-verified
# hash-green via filtered driver_sim in r15 (green runs + probes in
# SCALE.md r15) — pin them as the r16 window head so the
# never-driver-verified pool never regrows past one round. Also
# carry forward: quality_gopher_rules (gopher_doc_flags extraction,
# r15 — hash-green at the refactored shape in-round, re-pin to prove
# byte-identity in a driver artifact).
#
# ROUND-15 WINDOW: head = the 4 wave19a names (added r14, pre-verified
# hash-green then but still without a driver CORRECTNESS row — r14
# verdict ask #1), then the 4 wave20a additions (added THIS round and
# pre-verified hash-green via filtered driver_sim in-round, so the
# never-driver-verified pool closes to ZERO at r15 end instead of
# rolling forward), then the r15 re-shapes/refactors, the rows-only
# family (re-confirmed every rotation), and the 33 oldest-verified
# names (every remaining name last verified in r04) as regression
# canaries.
_DRIVER_WINDOW = [
    # round-14 additions, never driver-verified (4) — r14 verdict ask #1
    "dedup_gram50_exact",
    "quality_fasttext_linear",
    "eval_crossmodal_recall",
    "eval_reward_margin",
    # round-15 additions (wave20a), pre-verified hash-green in-round (4)
    "dedup_semdedup_prune",
    "text_langid_chargram",
    "data_doremi_reweight",
    "dedup_ensemble_agreement",
    # changed shape this round: md5-band sample bound moved INTO the
    # exact-truth leg (r14 verdict ask #2) — re-verified at new shape
    "eval_minhash_quality",
    # exact-centroid construction extracted to a shared operator
    # (operators/similarity.exact_centroid_arrays) — output must be
    # byte-identical; re-pinned to prove it
    "sim_topk_ivf_exact",
    # rows-only approx family, re-confirmed every rotation (7)
    "agg_approx_distinct",
    "agg_approx_quantile",
    "agg_hll_sketch",
    "dedup_minhash",
    "dedup_simhash",
    "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
    # oldest-verified regression canaries (33): every name below was
    # last driver-verified in round 4 (computed from the
    # CORRECTNESS_r01..r14 union) — the entire remaining r04 cohort
    "embed_quantize",
    "fn_array",
    "fn_array_setops",
    "fn_higher_order",
    "join_asof",
    "join_runtime_bloom",
    "lang_id",
    "multimodal_audio",
    "multimodal_decode",
    "multimodal_meta",
    "multimodal_png_codec",
    "multimodal_png_frames",
    "multimodal_resize",
    "multimodal_wav_codec",
    "scd_upsert",
    "sink_file_roundtrip",
    "stream_session",
    "stream_sliding",
    "stream_static_join",
    "stream_stream_join",
    "stream_tumbling",
    "stream_watermark",
    "synthetic_source",
    "text_chunks",
    "text_contamination",
    "text_pack_sequences",
    "text_quality",
    "text_quality_filter",
    "text_redact_pii",
    "text_stats",
    "text_tfidf",
    "text_tfidf_capped",
    "token_count",
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
