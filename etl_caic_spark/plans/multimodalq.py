"""Multimodal-plumbing queries (north star): binary payload metadata
(oracled via byte-level SQL) and the stubbed decode + frame-sample path
(rows-only; deterministic fake codec)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import multimodal as M
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           substring(hex(encode(text)), 1, 16) AS payload_prefix,
           'image/fake' AS mime,
           CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
           CAST(octet_length(encode(text)) % 48 + 16 AS INT) AS height
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct, flattened for the
    oracle (byte lengths / hex prefix are codec-independent)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    m = M.attach_binary_payload(d)
    return m.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.hex("payload"), 1, 16).alias("payload_prefix"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           substr(sha256(text), 1, 16) AS checksum,
           CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
           CAST(octet_length(encode(text)) % 48 + 16 AS INT) AS height,
           CAST(greatest(octet_length(encode(text)) // 64, 1) AS INT) AS n_frames,
           CAST(greatest(octet_length(encode(text)) // 64, 1) AS BIGINT) AS n_sampled
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode + feature extraction over mapInPandas, then the
    frame-sampling explode. The fake codec is byte-level deterministic
    (sha256 / octet lengths), so DuckDB CAN oracle it exactly — the real
    codec would drop to a rows-only check; determinism is additionally
    pinned in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    decoded = M.decode_media(M.attach_binary_payload(d))
    frames = M.sample_frames(decoded)
    return decoded.join(
        frames.groupBy("doc_id").agg(F.count("*").alias("n_sampled")), "doc_id"
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
           CAST(octet_length(encode(text)) % 48 + 16 AS INT) AS height,
           CAST(48 AS INT) AS target_w,
           CAST(32 AS INT) AS target_h,
           round(48.0 / (octet_length(encode(text)) % 64 + 16), 6) AS scale_x,
           round(32.0 / (octet_length(encode(text)) % 48 + 16), 6) AS scale_y,
           substr(sha256(text || '|48x32'), 1, 16) AS resized_checksum
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-codec resize over mapInPandas: scale factors + checksum of the
    payload tagged with the target dims (stand-in for the resampled pixel
    buffer — the Spark-side batch contract is the real one)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return M.resize_media(M.attach_binary_payload(d), target_w=48, target_h=32)


@register(
    "multimodal_audio",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), ch -> ord(ch)) AS cps
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           CAST(len(cps) AS INT) AS n_samples,
           CAST((len(cps) + 255) // 256 AS INT) AS n_windows,
           round(sqrt(CAST(list_sum(list_transform(cps, x -> x * x)) AS BIGINT)
                      * 1.0 / len(cps)), 6) AS rms,
           CAST(list_max(cps) AS INT) AS peak,
           round(CAST(list_sum(cps) AS BIGINT) * 1.0 / len(cps), 6) AS mean_cp
    FROM s
    """,
    tags=("multimodal",),
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction (code points as PCM samples) over
    mapInPandas; integer-exact sums make the doubles oracle-reproducible."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return M.audio_features(M.attach_binary_payload(d), window=256)


@register(
    "multimodal_frames",
    oracle="""
    SELECT doc_id,
           CAST(unnest(generate_series(0,
             greatest(octet_length(encode(text)) // 64, 1) - 1)) AS INT)
             AS frame_idx,
           CAST(unnest(generate_series(0,
             greatest(octet_length(encode(text)) // 64, 1) - 1)) * 64 AS BIGINT)
             AS byte_offset
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    tags=("multimodal",),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame explode of the decoded media rows (operators/multimodal.
    sample_frames): one row per sampled frame index plus its byte offset
    into the payload — the video frame-sampling fan-out a multimodal
    training pipeline feeds to the per-frame feature extractor. The fake
    codec's frame count is byte-deterministic, so the explode is fully
    oracled."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    frames = M.sample_frames(M.decode_media(M.attach_binary_payload(d)))
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("bigint") * 64).alias("byte_offset"),
    )


@register(
    "scan_binary_files",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS checksum
    FROM documents
    WHERE doc_id % 41 = 0
    """,
    tags=("multimodal", "source"),
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile SOURCE roundtrip: payloads are exported as one file per
    document from the executors (operators/multimodal.export_binary_files),
    then ingested with spark.read.format('binaryFile') — the real media
    ingestion path (content + length come from the file source, the id is
    parsed from the filename). Oracle recomputes length/checksum from the
    originating text."""
    import shutil

    from etl_caic_spark.util import scratch_path

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 41 == 0)
    out_dir = scratch_path("etl_caic_binary_export")
    shutil.rmtree(out_dir, ignore_errors=True)  # stale exports from other SFs
    M.export_binary_files(M.attach_binary_payload(d), out_dir).count()  # materialize export
    files = spark.read.format("binaryFile").load(out_dir)
    return files.select(
        F.regexp_extract(F.col("path"), "doc_(\\d+)\\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.substring(F.sha2(F.col("content"), 256), 1, 16).alias("checksum"),
    )
