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


@register("multimodal_decode", oracle=None, tags=("multimodal",))
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode + feature extraction over mapInPandas, then the
    frame-sampling explode — rows-only for the driver (no codec in the
    oracle); determinism pinned in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    decoded = M.decode_media(M.attach_binary_payload(d))
    frames = M.sample_frames(decoded)
    return decoded.join(
        frames.groupBy("doc_id").agg(F.count("*").alias("n_sampled")), "doc_id"
    )
