"""REAL-codec multimodal queries: payloads are genuine PNG / WAV bytes
(operators/codecs.py — pure stdlib zlib/struct, no PIL/soundfile needed),
and the pipeline decodes them back before computing features.

The trick that keeps these fully ORACLED despite DuckDB having no image
codec: pixel/sample values are a closed-form integer function of doc_id,
so the oracle computes the expected features directly, while the Spark
path routes the same values through encode→decode inside mapInPandas.
The hash-match therefore PROVES the codec roundtrip is bit-lossless —
a corrupted scanline filter, a dropped chunk, or a byte-order slip would
change the decoded sums and fail the oracle.

Scale: one Arrow-batched mapInPandas over the documents scan, payload
and features computed partition-parallel; no shuffle at all (Exchangex0),
no driver involvement — the codec cost rides inside the existing scan
pipeline exactly like the fake-codec path (multimodalq.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from etl_caic_spark.operators.multimodal import python_fanout
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_PNG_OUT = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "pixel_sum bigint, pixel_min int, pixel_max int, resized_sum bigint"
)
_WAV_OUT = (
    "doc_id bigint, n_samples int, sample_sum bigint, "
    "sample_min int, sample_max int"
)


def _png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            w, h = d % 24 + 8, d % 16 + 8
            # Even doc_ids are greyscale, odd are RGB — both supported
            # color types go through the real roundtrip.
            ch = 1 if d % 2 == 0 else 3
            i = np.arange(w * h * ch, dtype=np.int64)
            px = ((d * 2654435761 + i * 1103515245 + 12345) % 256).astype(
                np.uint8
            )
            img = px.reshape(h, w) if ch == 1 else px.reshape(h, w, 3)
            decoded = decode_png(encode_png(img))  # the real byte roundtrip
            small = resize_nearest(decoded, 16, 16)
            rows.append(
                (
                    d,
                    decoded.shape[1],
                    decoded.shape[0],
                    decoded.size,
                    int(decoded.astype(np.int64).sum()),
                    int(decoded.min()),
                    int(decoded.max()),
                    int(small.astype(np.int64).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "n_pixels",
                "pixel_sum",
                "pixel_min",
                "pixel_max",
                "resized_sum",
            ],
        )


@register(
    "multimodal_png_codec",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             (doc_id * 2654435761 + i * 1103515245 + 12345) % 256 AS p
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h*ch - 1)) AS i) g
    ),
    agg AS (
      SELECT doc_id, CAST(min(w) AS INT) AS width, CAST(min(h) AS INT) AS height,
             CAST(count(*) AS BIGINT) AS n_pixels,
             CAST(sum(p) AS BIGINT) AS pixel_sum,
             CAST(min(p) AS INT) AS pixel_min, CAST(max(p) AS INT) AS pixel_max
      FROM px GROUP BY doc_id
    ),
    rs AS (
      SELECT d.doc_id,
             CAST(sum((d.doc_id * 2654435761
                       + ((((r.r * d.h) // 16) * d.w + ((c.c * d.w) // 16))
                          * d.ch + k.k)
                         * 1103515245 + 12345) % 256) AS BIGINT) AS resized_sum
      FROM dims d,
           LATERAL (SELECT unnest(generate_series(0, 15)) AS r) r,
           LATERAL (SELECT unnest(generate_series(0, 15)) AS c) c,
           LATERAL (SELECT unnest(generate_series(0, d.ch - 1)) AS k) k
      GROUP BY d.doc_id
    )
    SELECT agg.*, rs.resized_sum FROM agg JOIN rs USING (doc_id)
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_png_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG pipeline: per document, synthesize an image from the
    closed-form pixel function (even doc_ids greyscale, odd RGB — both
    supported color types), ENCODE it to genuine PNG bytes, DECODE
    the bytes back (operators/codecs.py — all five scanline filters
    supported), nearest-neighbor resize to 16×16, and emit integer pixel
    features. The oracle computes the same features straight from the
    closed form — equality proves the PNG roundtrip is lossless."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_png_batches, _PNG_OUT)


def _wav_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_wav, encode_wav

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            n = d % 400 + 100
            # Even doc_ids mono, odd stereo (interleaved) — both supported
            # channel layouts go through the real roundtrip.
            ch = 1 if d % 2 == 0 else 2
            i = np.arange(n * ch, dtype=np.int64)
            s = (((d * 31 + i * i * 7) % 65536) - 32768).astype(np.int16)
            if ch == 2:
                s = s.reshape(n, 2)
            decoded, rate = decode_wav(encode_wav(s, rate=16000))
            assert rate == 16000
            rows.append(
                (
                    d,
                    decoded.shape[0],
                    int(decoded.astype(np.int64).sum()),
                    int(decoded.min()),
                    int(decoded.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_samples",
                "sample_sum",
                "sample_min",
                "sample_max",
            ],
        )


@register(
    "multimodal_wav_codec",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 400 + 100 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS ch
      FROM documents
    ),
    smp AS (
      SELECT doc_id, n, ((doc_id * 31 + i * i * 7) % 65536) - 32768 AS s
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, n*ch - 1)) AS i) g
    )
    SELECT doc_id, CAST(min(n) AS INT) AS n_samples,
           CAST(sum(s) AS BIGINT) AS sample_sum,
           CAST(min(s) AS INT) AS sample_min, CAST(max(s) AS INT) AS sample_max
    FROM smp GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_wav_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV pipeline: per document, synthesize PCM-16 samples from
    the closed-form function (even doc_ids mono, odd interleaved stereo),
    encode to genuine RIFF/WAVE bytes, decode back
    (operators/codecs.py), and emit integer sample features. Oracle
    computes the same features from the closed form — equality proves the
    WAV roundtrip is lossless."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_wav_batches, _WAV_OUT)


_FRAMES_OUT = (
    "doc_id bigint, frame int, width int, height int, frame_sum bigint"
)


def _frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_png, encode_png

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            n_frames = d % 4 + 2
            w, h = d % 12 + 8, d % 8 + 8
            # The "video": one binary blob of n concatenated PNG frames —
            # encoded for real, then split & decoded for real.
            frames = []
            for f in range(n_frames):
                i = np.arange(w * h, dtype=np.int64)
                px = (
                    (d * 2654435761 + f * 97 + i * 1103515245 + 12345) % 256
                ).astype(np.uint8)
                frames.append(encode_png(px.reshape(h, w)))
            blob = b"".join(frames)
            # Frame boundaries are recovered from the container itself:
            # each PNG starts with the 8-byte signature.
            sig = b"\x89PNG\r\n\x1a\n"
            starts = []
            off = 0
            while True:
                k = blob.find(sig, off)
                if k < 0:
                    break
                starts.append(k)
                off = k + 8
            starts.append(len(blob))
            for f in range(len(starts) - 1):
                decoded = decode_png(blob[starts[f] : starts[f + 1]])
                rows.append(
                    (
                        d,
                        f,
                        decoded.shape[1],
                        decoded.shape[0],
                        int(decoded.astype(np.int64).sum()),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame", "width", "height", "frame_sum"]
        )


@register(
    "multimodal_png_frames",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 4 + 2 AS nf,
             doc_id % 12 + 8 AS w, doc_id % 8 + 8 AS h
      FROM documents
    ),
    fr AS (
      SELECT doc_id, w, h, f
      FROM dims, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) g
    ),
    px AS (
      SELECT doc_id, w, h, f,
             (doc_id * 2654435761 + f * 97 + i * 1103515245 + 12345) % 256 AS p
      FROM fr, LATERAL (SELECT unnest(generate_series(0, w*h - 1)) AS i) g2
    )
    SELECT doc_id, CAST(f AS INT) AS frame, CAST(min(w) AS INT) AS width,
           CAST(min(h) AS INT) AS height, CAST(sum(p) AS BIGINT) AS frame_sum
    FROM px GROUP BY doc_id, f
    """,
    tags=("multimodal", "codec", "udf", "frames"),
)
def multimodal_png_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over REAL bytes: per document, a 'video' blob of 2-5
    concatenated genuine PNG frames is encoded, then split back on the PNG
    signature and each frame decoded (operators/codecs.py) to per-frame
    pixel features — the decode/frame-sample shape of a video pipeline
    with an actual binary container instead of a fake. Closed-form pixels
    keep it oracle-checkable: equality proves every frame of every blob
    survived the container roundtrip bit-exactly."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_frame_batches, _FRAMES_OUT)


_BMP_OUT = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "pixel_sum bigint, pixel_min int, pixel_max int"
)


def _bmp_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_bmp, encode_bmp

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            # Non-multiple-of-4 widths on purpose: w*ch mod 4 varies, so the
            # 4-byte row-padding logic is exercised on both encode & decode.
            w, h = d % 21 + 6, d % 13 + 6
            ch = 1 if d % 2 == 0 else 3
            i = np.arange(w * h * ch, dtype=np.int64)
            px = ((d * 2246822519 + i * 2654435761 + 101) % 256).astype(
                np.uint8
            )
            img = px.reshape(h, w) if ch == 1 else px.reshape(h, w, 3)
            decoded = decode_bmp(encode_bmp(img))  # the real byte roundtrip
            rows.append(
                (
                    d,
                    decoded.shape[1],
                    decoded.shape[0],
                    decoded.size,
                    int(decoded.astype(np.int64).sum()),
                    int(decoded.min()),
                    int(decoded.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "n_pixels",
                "pixel_sum",
                "pixel_min",
                "pixel_max",
            ],
        )


@register(
    "multimodal_bmp_codec",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 21 + 6 AS w, doc_id % 13 + 6 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             (doc_id * 2246822519 + i * 2654435761 + 101) % 256 AS p
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h*ch - 1)) AS i) g
    )
    SELECT doc_id, CAST(min(w) AS INT) AS width, CAST(min(h) AS INT) AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(p) AS BIGINT) AS pixel_sum,
           CAST(min(p) AS INT) AS pixel_min, CAST(max(p) AS INT) AS pixel_max
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_bmp_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BMP pipeline (round 5): per document, synthesize an image from
    a closed-form pixel function (even doc_ids 8-bit-indexed greyscale,
    odd 24-bit RGB), ENCODE to genuine Windows BMP bytes
    (operators/codecs.py — BITMAPINFOHEADER, bottom-up BGR rows, 4-byte
    row padding, greyscale palette), DECODE the bytes back, and emit
    integer pixel features. Widths are chosen so the row padding is
    non-zero for most rows — a padding slip would shear the image and
    change pixel_sum. The oracle computes the same features straight from
    the closed form — equality proves the BMP roundtrip is lossless."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_bmp_batches, _BMP_OUT)


_GIF_OUT = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "pixel_sum bigint, pixel_min int, pixel_max int"
)


def _gif_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            w, h = d % 19 + 6, d % 11 + 6
            i = np.arange(w * h, dtype=np.int64)
            px = ((d * 40503 + i * 2654435761 + 77) % 256).astype(np.uint8)
            img = px.reshape(h, w)
            decoded = decode_gif(encode_gif(img))  # real LZW roundtrip
            rows.append(
                (
                    d,
                    decoded.shape[1],
                    decoded.shape[0],
                    decoded.size,
                    int(decoded.astype(np.int64).sum()),
                    int(decoded.min()),
                    int(decoded.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "n_pixels",
                "pixel_sum",
                "pixel_min",
                "pixel_max",
            ],
        )


@register(
    "multimodal_gif_codec",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 19 + 6 AS w, doc_id % 11 + 6 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             (doc_id * 40503 + i * 2654435761 + 77) % 256 AS p
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h - 1)) AS i) g
    )
    SELECT doc_id, CAST(min(w) AS INT) AS width, CAST(min(h) AS INT) AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(p) AS BIGINT) AS pixel_sum,
           CAST(min(p) AS INT) AS pixel_min, CAST(max(p) AS INT) AS pixel_max
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_gif_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF87a pipeline (round 5): per document, synthesize a
    greyscale image from a closed-form pixel function, ENCODE to genuine
    GIF bytes — including a REAL variable-width LZW compressor
    (operators/codecs.py: 9→12-bit codes, LSB-first packing, CLEAR-code
    table resets) — DECODE back, and emit integer pixel features. The
    oracle computes the same features from the closed form; the hash
    match proves the LZW encode→decode roundtrip is lossless. Random
    pixels stress worst-case LZW (table overflow + resets on larger
    images are pinned by tests/test_codecs.py)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_gif_batches, _GIF_OUT)


_WAVF_OUT = (
    "doc_id bigint, n_samples int, energy bigint, peak int, zero_crossings int"
)


def _wav_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_wav, encode_wav

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            n = d % 400 + 100
            ch = 1 if d % 2 == 0 else 2
            i = np.arange(n * ch, dtype=np.int64)
            s = (((d * 31 + i * i * 7) % 65536) - 32768).astype(np.int16)
            if ch == 2:
                s = s.reshape(n, 2)
            decoded, rate = decode_wav(encode_wav(s, rate=16000))
            assert rate == 16000
            ch0 = (decoded[:, 0] if decoded.ndim == 2 else decoded).astype(
                np.int64
            )
            energy = int((ch0 * ch0).sum())
            peak = int(np.abs(ch0).max())
            zcr = int(((ch0[:-1] * ch0[1:]) < 0).sum())
            rows.append((d, int(ch0.shape[0]), energy, peak, zcr))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "energy", "peak", "zero_crossings"],
        )


@register(
    "multimodal_wav_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 400 + 100 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS ch
      FROM documents
    ),
    ch0 AS (
      SELECT doc_id, j,
             ((doc_id * 31 + (j * ch) * (j * ch) * 7) % 65536) - 32768 AS s
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, n - 1)) AS j) g
    ),
    seq AS (
      SELECT doc_id, s,
             lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS prev_s
      FROM ch0
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS INT) AS peak,
           CAST(sum(CASE WHEN prev_s * s < 0 THEN 1 ELSE 0 END) AS INT)
             AS zero_crossings
    FROM seq GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over the REAL WAV codec: synthesize
    closed-form PCM-16 clips, encode->decode through genuine RIFF/WAVE
    bytes (operators/codecs.py), then compute channel-0 DSP features —
    energy (sum of squares), peak amplitude, and zero-crossing count —
    entirely in int64, so the oracle can replay them from the closed
    form with zero float tolerance. The decode step is the part a real
    pipeline runs; equality proves features were computed on losslessly
    decoded samples, not on the synthetic shortcut.

    Scale: mapInPandas (Arrow-batched) over binary payloads — the same
    partition-parallel shape as multimodal_wav_codec; features are a
    single numpy pass per clip, no Python-per-sample loops."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_wav_feature_batches, _WAVF_OUT)


_IMGSTATS_OUT = (
    "doc_id bigint, channel int, n_px bigint, ch_sum bigint, "
    "ch_min int, ch_max int"
)


def _image_stats_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_png, encode_png

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            if d % 2 == 0:
                continue  # RGB docs only (odd doc_ids, per the png family)
            w, h = d % 24 + 8, d % 16 + 8
            i = np.arange(w * h * 3, dtype=np.int64)
            px = ((d * 2654435761 + i * 1103515245 + 12345) % 256).astype(
                np.uint8
            )
            img = decode_png(encode_png(px.reshape(h, w, 3)))
            flat = img.astype(np.int64)
            for c in range(3):
                ch = flat[:, :, c]
                rows.append(
                    (d, c, int(ch.size), int(ch.sum()), int(ch.min()),
                     int(ch.max()))
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "channel", "n_px", "ch_sum", "ch_min", "ch_max"],
        )


@register(
    "multimodal_image_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
      FROM documents WHERE doc_id % 2 = 1
    ),
    px AS (
      SELECT doc_id, CAST(i % 3 AS INT) AS channel,
             (doc_id * 2654435761 + i * 1103515245 + 12345) % 256 AS p
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h*3 - 1)) AS i) g
    )
    SELECT doc_id, channel,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(p) AS BIGINT) AS ch_sum,
           CAST(min(p) AS INT) AS ch_min,
           CAST(max(p) AS INT) AS ch_max
    FROM px GROUP BY 1, 2
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel image statistics over the REAL PNG roundtrip: for
    each RGB document image (odd doc_ids, same closed-form pixel
    function as multimodal_png_codec), encode->decode through genuine
    PNG bytes, split channels, and emit count/sum/min/max per channel —
    the normalize-prep statistics (channel means for whitening) an image
    training pipeline computes corpus-wide. The decoded array is
    interleaved RGB, so channel c is flat index i with i%3==c — the
    oracle states exactly that over the closed form; a channel-order or
    interleave slip in the codec would mis-assign every channel and
    hash-mismatch.

    Scale: mapInPandas over the documents scan, one numpy slice per
    channel, no shuffle before the per-image emit; corpus-wide channel
    means would add one tiny map-side-combinable aggregate on top."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_image_stats_batches, _IMGSTATS_OUT)
