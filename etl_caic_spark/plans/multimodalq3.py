"""Wave 24 (round 5): vision/audio TRAINING-PREP transforms over the
real codecs — ViT-style patch extraction from PNG-roundtripped images
and stride decimation of WAV-roundtripped PCM. Both run the genuine
encode→decode byte path (operators/codecs.py) inside Arrow-batched
mapInPandas and emit integer features the oracle replays from the
closed-form payloads — so the transform chain (codec → numpy reshape /
stride → features) is hash-proven end-to-end, not faked.

These are the two transforms every multimodal training pipeline runs
between storage and the model: images become fixed patch grids
(ViT/DiT input), audio is downsampled to the model rate. JPEG/MP3
remain NotImplementedError-gated (external libs); the plumbing —
schema, batching, partition parallelism — is identical for them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from etl_caic_spark.operators.multimodal import python_fanout
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_PATCH_OUT = (
    "doc_id bigint, patch_row int, patch_col int, "
    "patch_sum bigint, patch_min int, patch_max int"
)

_DECIM_OUT = (
    "doc_id bigint, n_in int, n_out int, energy bigint, peak int"
)


def _patch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_png, encode_png

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            i = np.arange(32 * 32, dtype=np.int64)
            px = ((d * 2654435761 + i * 1103515245 + 12345) % 256).astype(
                np.uint8
            )
            img = px.reshape(32, 32)
            decoded = decode_png(encode_png(img))  # real byte roundtrip
            # 4x4 grid of 8x8 patches: (pr, dy, pc, dx)
            p = decoded.reshape(4, 8, 4, 8).astype(np.int64)
            sums = p.sum(axis=(1, 3))
            mins = p.min(axis=(1, 3))
            maxs = p.max(axis=(1, 3))
            for pr in range(4):
                for pc in range(4):
                    rows.append(
                        (
                            d,
                            pr,
                            pc,
                            int(sums[pr, pc]),
                            int(mins[pr, pc]),
                            int(maxs[pr, pc]),
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "patch_row",
                "patch_col",
                "patch_sum",
                "patch_min",
                "patch_max",
            ],
        )


@register(
    "multimodal_patchify",
    oracle="""
    WITH grid AS (
      SELECT doc_id, pr.pr, pc.pc, dy.dy, dx.dx,
             (doc_id * 2654435761
              + ((pr.pr * 8 + dy.dy) * 32 + pc.pc * 8 + dx.dx)
                * 1103515245 + 12345) % 256 AS p
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, 3)) AS pr) pr,
           LATERAL (SELECT unnest(generate_series(0, 3)) AS pc) pc,
           LATERAL (SELECT unnest(generate_series(0, 7)) AS dy) dy,
           LATERAL (SELECT unnest(generate_series(0, 7)) AS dx) dx
    )
    SELECT doc_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
           CAST(sum(p) AS BIGINT) AS patch_sum,
           CAST(min(p) AS INT) AS patch_min,
           CAST(max(p) AS INT) AS patch_max
    FROM grid GROUP BY 1, 2, 3
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction through the REAL PNG codec: a 32×32
    closed-form image is encoded to genuine PNG bytes, decoded back,
    reshaped to a 4×4 grid of 8×8 patches with a single numpy
    (4,8,4,8) view (no Python pixel loops), and per-patch integer
    sum/min/max are emitted — 16 rows per image, the tensor layout a
    vision trainer consumes. The oracle recomputes each patch straight
    from the closed-form pixel function with the same (row-major,
    patch-grid) index arithmetic — equality proves both the codec
    roundtrip AND the patch reindexing are exact.

    Scale: mapInPandas, Arrow-batched, partition-parallel — per-image
    work is O(pixels) with vectorized reshapes; output fans out 16×
    rows but each is 6 ints. At 100 TB this is the classic decode+
    patchify stage before writing training shards (pairs with
    multimodal_tar_shards)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_patch_batches, _PATCH_OUT)


def _decimate_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_wav, encode_wav

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            n = d % 400 + 100
            i = np.arange(n, dtype=np.int64)
            s = (((d * 31 + i * i * 7) % 65536) - 32768).astype(np.int16)
            decoded, rate = decode_wav(encode_wav(s, rate=16000))
            assert rate == 16000
            mono = decoded[:, 0] if decoded.ndim == 2 else decoded
            dec = mono[::4]  # stride-4 decimation 16 kHz -> 4 kHz
            # re-encode at the new rate and roundtrip AGAIN - proves the
            # decimated signal survives its own codec pass losslessly
            dec2, rate2 = decode_wav(encode_wav(dec, rate=4000))
            assert rate2 == 4000
            ch0 = (dec2[:, 0] if dec2.ndim == 2 else dec2).astype(np.int64)
            rows.append(
                (
                    d,
                    int(mono.shape[0]),
                    int(ch0.shape[0]),
                    int((ch0 * ch0).sum()),
                    int(np.abs(ch0).max()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_in", "n_out", "energy", "peak"]
        )


@register(
    "multimodal_audio_decimate",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 400 + 100 AS n FROM documents
    ),
    dec AS (
      SELECT doc_id, n,
             ((doc_id * 31 + (4 * j) * (4 * j) * 7) % 65536) - 32768 AS s
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, (n + 3) // 4 - 1)) AS j) g
    )
    SELECT doc_id,
           CAST(min(n) AS INT) AS n_in,
           CAST(count(*) AS INT) AS n_out,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS INT) AS peak
    FROM dec GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio downsampling by stride-4 decimation (16 kHz → 4 kHz)
    through TWO real WAV roundtrips: closed-form PCM-16 is encoded →
    decoded, every 4th sample kept (numpy stride view, no copies), and
    the decimated clip is re-encoded at the new rate and decoded AGAIN
    before features are computed — so the oracle equality proves the
    decimated signal survives its own codec pass losslessly, the
    property a resampling stage must guarantee. Features (energy, peak)
    are int64-exact. Plain decimation aliases above Nyquist/2 — a
    production resampler low-passes first; the stride/stats plumbing
    here is rate-conversion-agnostic.

    Scale: identical mapInPandas envelope as multimodal_wav_codec —
    Arrow batches, one numpy pass per clip, partition-parallel."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_decimate_batches, _DECIM_OUT)
