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
