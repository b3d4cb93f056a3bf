"""Multimodal column plumbing (BASELINE.json north star): image/audio/video
as opaque BINARY columns with typed metadata structs, decoded/feature-
extracted via Arrow-batched mapInPandas.

The decode step routes REAL container formats (PNG/BMP/GIF magic bytes)
through the pure-stdlib codecs in operators/codecs.py and takes a
deterministic byte-stat fallback for opaque payloads (the oracled
fixture queries encode text bytes, which keeps their hashes stable).
Everything Spark-side is real and tested: the binary column, the
metadata schema, the mapInPandas batch iterator signature, partition
behavior, and the frame-sampling explode.

Scale: payload bytes travel in the columns (at 100 TB the binary column
lives in parquet row groups next to its metadata — no side files, no
driver round-trips); decode runs partition-parallel in Arrow batches
sized by spark.sql.execution.arrow.maxRecordsPerBatch."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, checksum string, width int, height int, n_frames int"
)


def python_fanout(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism ahead of a
    CPU-heavy Python (mapInPandas) stage.

    A single-file parquet scan yields ONE input split, which serializes
    the whole Python stage onto one task — the r8 bench showed the GIF
    LZW encoder running 5000 images on 1 of 32 cores. The extra shuffle
    moves only the stage's projected input columns (for the synthetic
    codec queries that is one bigint per row); on a real multi-file
    input whose split count already exceeds the core count the
    repartition is redundant and can be dropped at the call site."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal-shaped table: an opaque
    binary payload column plus a typed metadata struct (mime / declared
    dims), derived deterministically from the text."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.octet_length("text") % 64 + 16).cast("int").alias("width"),
            (F.octet_length("text") % 48 + 16).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def _decode_payload(payload: bytes) -> tuple[int, str, int, int]:
    """Decode a media payload: REAL container formats (PNG/BMP/GIF, the
    pure-stdlib codecs in operators/codecs.py) yield their true pixel
    dimensions; any other byte string gets the deterministic byte-stat
    fallback (length-derived dims) so opaque fixture payloads stay
    hash-stable. Magic-byte sniff first — never throws."""
    from etl_caic_spark.operators import codecs

    digest = hashlib.sha256(payload).hexdigest()[:16]
    n = len(payload)
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            arr = codecs.decode_png(payload)
            return n, digest, arr.shape[1], arr.shape[0]
        if payload[:2] == b"BM":
            arr = codecs.decode_bmp(payload)
            return n, digest, arr.shape[1], arr.shape[0]
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            arr = codecs.decode_gif(payload)
            return n, digest, arr.shape[1], arr.shape[0]
    except Exception:
        pass  # malformed container -> byte-stat fallback below
    return n, digest, n % 64 + 16, n % 48 + 16


def decode_media(df: DataFrame, frame_every: int = 64) -> DataFrame:
    """mapInPandas decode + feature extraction: per row, byte length,
    checksum, decoded dims, and a frame count (len // frame_every — the
    video-ish frame-sampling knob). Real PNG/BMP/GIF payloads are decoded
    by operators/codecs.py; opaque payloads take the deterministic
    byte-stat path (the oracled fixture queries rely on it)."""

    def _decode(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": [],
                "checksum": [],
                "width": [],
                "height": [],
                "n_frames": [],
            }
            for payload in pdf["payload"]:
                raw = bytes(payload)
                n, digest, w, h = _decode_payload(raw)
                out["n_bytes"].append(n)
                out["checksum"].append(digest)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(max(n // frame_every, 1))
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, target_w int, target_h int, "
    "scale_x double, scale_y double, resized_checksum string"
)


def resize_media(df: DataFrame, target_w: int = 48, target_h: int = 32) -> DataFrame:
    """mapInPandas 'resize': recompute dims/scale factors and the checksum
    of the (fake-)resized payload — payload + target-dims tag stands in for
    the real resampled pixel buffer. Swap the checksum input for the real
    codec's output buffer when codecs exist; batch shape is identical."""

    def _resize(batches):
        tag = f"|{target_w}x{target_h}".encode()
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "width": [],
                "height": [],
                "target_w": [],
                "target_h": [],
                "scale_x": [],
                "scale_y": [],
                "resized_checksum": [],
            }
            for payload, meta in zip(pdf["payload"], pdf["media_meta"]):
                raw = bytes(payload)
                w, h = int(meta["width"]), int(meta["height"])
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(target_w)
                out["target_h"].append(target_h)
                out["scale_x"].append(round(target_w / w, 6))
                out["scale_y"].append(round(target_h / h, 6))
                out["resized_checksum"].append(
                    hashlib.sha256(raw + tag).hexdigest()[:16]
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, n_samples int, n_windows int, rms double, peak int, mean_cp double"
)


def audio_features(df: DataFrame, window: int = 256) -> DataFrame:
    """mapInPandas audio-style feature extraction: treat the payload's code
    points as PCM samples; emit sample/window counts, global RMS, peak and
    mean. Sums are computed in exact integer arithmetic so the DuckDB
    oracle (list_sum over ord()) reproduces the doubles bit-for-bit."""

    def _features(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_samples": [],
                "n_windows": [],
                "rms": [],
                "peak": [],
                "mean_cp": [],
            }
            for payload in pdf["payload"]:
                cps = [c for c in bytes(payload).decode("utf-8")]
                ords = [ord(c) for c in cps]
                n = len(ords)
                ss = sum(o * o for o in ords)
                s = sum(ords)
                out["n_samples"].append(n)
                out["n_windows"].append((n + window - 1) // window)
                # math.sqrt (C sqrt, correctly rounded) — pow(x, 0.5) may
                # differ in the last ulp from the oracle's sqrt().
                out["rms"].append(round(math.sqrt(ss / n), 6) if n else 0.0)
                out["peak"].append(max(ords) if n else 0)
                out["mean_cp"].append(round(s / n, 6) if n else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(_features, AUDIO_SCHEMA)


def sample_frames(decoded: DataFrame) -> DataFrame:
    """Explode one row per sampled frame index (the video frame-sample
    pattern): deterministic, JVM-side sequence+explode — no Python."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )


EXPORT_MANIFEST_SCHEMA = "doc_id bigint, rel_path string, n_bytes int"


def export_binary_files(df: DataFrame, out_dir: str) -> DataFrame:
    """Write each row's binary payload as its own file (doc_<id>.bin) from
    the EXECUTORS via mapInPandas — partition-parallel media export, the
    write half of binaryFile ingestion (no driver-side loop, no collect).
    Returns the manifest (doc_id, rel_path, n_bytes)."""
    import os

    def _write(batches):
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            out = {"doc_id": [], "rel_path": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rel = f"doc_{doc_id}.bin"
                with open(os.path.join(out_dir, rel), "wb") as f:
                    f.write(bytes(payload))
                out["doc_id"].append(doc_id)
                out["rel_path"].append(rel)
                out["n_bytes"].append(len(payload))
            import pandas as pd

            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        _write, EXPORT_MANIFEST_SCHEMA
    )
