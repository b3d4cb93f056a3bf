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

# Driver window (positions 0..49). Families with no driver row yet come
# first; the last slots are stable core representatives (canaries).
# Round-4 edit: the new real-codec and runtime-bloom queries take the
# slots of three sink roundtrips + fuzzy dedup (driver-green since r02,
# untouched since); every events-rooted query that was red in r03 stays
# in the window so CORRECTNESS_r04 re-verifies the loader fix.
_DRIVER_WINDOW = [
    # array-output queries re-worked this round to emit scalar cells
    "fn_array",
    "fn_array_setops",
    "fn_higher_order",
    "doc_fingerprint",
    "embed_normalize",
    "embed_quantize",
    # text / LLM-pipeline surface
    "text_stats",
    "text_quality",
    "lang_id",
    "token_count",
    "text_tfidf",
    "text_tfidf_capped",
    "text_chunks",
    "text_pack_sequences",
    "text_contamination",
    "dedup_jaccard_capped",
    "vocab_topk",
    "text_quality_filter",
    "text_redact_pii",
    # UDF surface (pandas UDF / UDAF / applyInPandas / mapInPandas)
    "udf_scalar",
    "udaf_grouped",
    "udtf_apply_in_pandas",
    "udf_map_in_pandas",
    # streaming (real Structured Streaming queries)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_stream_join",
    "stream_watermark",
    "stream_static_join",
    # flagship
    "caic_pipeline",
    # multimodal plumbing + round-4 REAL codecs
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_audio",
    "multimodal_png_codec",
    "multimodal_wav_codec",
    "multimodal_png_frames",
    # round-4 runtime-filter join + sink representative
    "join_runtime_bloom",
    "sink_file_roundtrip",
    # remaining dedup / sampling / pipeline ops without a driver row
    "dedup_embedding_cosine",
    "dedup_groups",
    "train_test_split",
    "sample_fraction",
    "sample_stratified",
    "synthetic_source",
    "scd_upsert",
    # stable round-1-green core representatives (regression canaries);
    # join_asof was re-worked this round (atomic struct fill) → re-verify
    "scan_project",
    "join_asof",
    "agg_groupby_q1",
    "dedup_exact",
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
