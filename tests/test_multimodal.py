"""Multimodal plumbing: the fake decode must be deterministic and agree
with a Python-side recomputation; frame sampling must explode exactly
n_frames rows per doc."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_caic_spark.operators import multimodal as M
from etl_caic_spark.sources import load_table


def test_decode_matches_python(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    decoded = {r["doc_id"]: r for r in M.decode_media(M.attach_binary_payload(d)).collect()}
    assert set(decoded) == set(texts)
    for doc_id, text in texts.items():
        raw = text.encode("utf-8")
        r = decoded[doc_id]
        assert r["n_bytes"] == len(raw)
        assert r["checksum"] == hashlib.sha256(raw).hexdigest()[:16]
        assert r["width"] == len(raw) % 64 + 16
        assert r["height"] == len(raw) % 48 + 16
        assert r["n_frames"] == max(len(raw) // 64, 1)


def test_frame_sampling_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    decoded = M.decode_media(M.attach_binary_payload(d))
    frames = M.sample_frames(decoded)
    per_doc = {
        r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    expected = {r["doc_id"]: r["n_frames"] for r in decoded.collect()}
    assert per_doc == expected


def test_resize_checksum_and_scales(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    resized = {
        r["doc_id"]: r
        for r in M.resize_media(M.attach_binary_payload(d), 48, 32).collect()
    }
    for doc_id, text in texts.items():
        raw = text.encode("utf-8")
        r = resized[doc_id]
        w = len(raw) % 64 + 16
        assert r["width"] == w
        assert r["scale_x"] == round(48 / w, 6)
        assert r["resized_checksum"] == (
            __import__("hashlib").sha256(raw + b"|48x32").hexdigest()[:16]
        )


def test_audio_features_match_python(spark, sf_dir):
    import math

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    feats = {
        r["doc_id"]: r
        for r in M.audio_features(M.attach_binary_payload(d), 256).collect()
    }
    for doc_id, text in texts.items():
        ords = [ord(c) for c in text]
        r = feats[doc_id]
        assert r["n_samples"] == len(ords)
        assert r["n_windows"] == (len(ords) + 255) // 256
        assert r["rms"] == round(math.sqrt(sum(o * o for o in ords) / len(ords)), 6)
        assert r["peak"] == max(ords)


def test_decode_media_routes_real_png_through_codec(spark):
    """decode_media must return TRUE pixel dimensions for a genuine PNG
    payload (magic-byte sniff -> operators/codecs.py), not the byte-stat
    fallback — the round-5 verdict's 'rewire the fake-decode stub' item."""
    import numpy as np

    from etl_caic_spark.operators import codecs

    arr = (np.arange(7 * 11 * 3, dtype=np.uint8).reshape(7, 11, 3) * 3) % 251
    png = codecs.encode_png(arr)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not a png at all"))],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in M.decode_media(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (11, 7)  # real dims
    n = len(b"not a png at all")
    assert (out[2]["width"], out[2]["height"]) == (n % 64 + 16, n % 48 + 16)
