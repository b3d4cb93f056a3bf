"""Wave 19 (round 5): WebDataset-style tar sharding and deterministic
data-mixture sampling — the two packaging steps between a curated corpus
and a training run.

`multimodal_tar_shards` is proven the codec-family way: sample payloads
are a closed-form function of doc_id, the Spark path routes them through
REAL tar pack → binaryFile scan → tar unpack → PNG decode, and the
oracle computes the expected features directly — a hash match proves the
whole shard roundtrip (tar member naming, ordering, byte integrity, PNG
codec) is lossless.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

_SHARD_SIZE = 50


def _sample_png(doc_id: int) -> bytes:
    from etl_caic_spark.operators.codecs import encode_png

    w, h = doc_id % 24 + 8, doc_id % 16 + 8
    i = np.arange(w * h, dtype=np.int64)
    px = ((doc_id * 2654435761 + i * 1103515245 + 12345) % 256).astype(np.uint8)
    return encode_png(px.reshape(h, w))


def _pack_shards(base: str):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        path = os.path.join(base, f"shard-{shard_id:05d}.tar")
        pdf = pdf.sort_values("doc_id")
        with tarfile.open(path, "w") as tar:
            for _, row in pdf.iterrows():
                d = int(row["doc_id"])
                png = _sample_png(d)
                txt = str(row["text"]).encode("utf-8")
                for name, payload in ((f"{d:08d}.png", png), (f"{d:08d}.txt", txt)):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic shard bytes
                    tar.addfile(info, io.BytesIO(payload))
        return pd.DataFrame({"shard_id": [shard_id], "n_samples": [len(pdf)]})

    return pack


def _unpack_shards(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from etl_caic_spark.operators.codecs import decode_png

    for pdf in it:
        rows = []
        for _, row in pdf.iterrows():
            shard_id = int(
                os.path.basename(row["path"]).split("-")[1].split(".")[0]
            )
            with tarfile.open(fileobj=io.BytesIO(row["content"])) as tar:
                members = {m.name: tar.extractfile(m).read() for m in tar}
            for name, payload in members.items():
                if not name.endswith(".png"):
                    continue
                d = int(name.split(".")[0])
                img = decode_png(payload)
                txt = members[f"{d:08d}.txt"].decode("utf-8")
                rows.append(
                    (
                        d,
                        shard_id,
                        img.shape[1],
                        img.shape[0],
                        int(img.astype(np.int64).sum()),
                        len(txt),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "shard_id", "width", "height", "pixel_sum", "text_len",
            ],
        )


@register(
    "multimodal_tar_shards",
    oracle="""
    WITH dims AS (
      SELECT doc_id, CAST(doc_id // 50 AS INT) AS shard_id,
             doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h,
             length(text) AS text_len
      FROM documents
    ),
    px AS (
      SELECT doc_id,
             CAST(sum((doc_id * 2654435761 + i * 1103515245 + 12345) % 256)
                  AS BIGINT) AS pixel_sum
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h - 1)) AS i) g
      GROUP BY 1
    )
    SELECT d.doc_id, d.shard_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           px.pixel_sum, CAST(d.text_len AS INT) AS text_len
    FROM dims d JOIN px USING (doc_id)
    """,
    tags=("multimodal", "codec", "udf", "scale"),
)
def multimodal_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style tar sharding, end to end: pack each block of 50
    documents into a tar shard holding {key}.png (REAL PNG bytes from
    the closed-form pixel function) + {key}.txt pairs — applyInPandas
    per shard group, so shards are written partition-parallel, one tar
    per group, deterministic bytes (sorted members, zeroed mtime); then
    READ the shards back with the binaryFile source and unpack/decode
    inside mapInPandas, emitting per-sample features. The oracle
    computes the same features straight from the closed form + the
    documents table — a hash match proves the tar member naming,
    pairing, byte integrity, AND the PNG codec survived the roundtrip.
    This is the exact packaging shape large multimodal training uses
    (shard-per-task sequential reads, no per-sample small files); at
    100 TB the shard size rises to ~1 GB and both stages stay
    embarrassingly parallel — no shuffle except the groupBy that forms
    shard membership."""
    base = scratch_path("webdataset_shards")
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") / _SHARD_SIZE).cast("int").alias("shard_id")
    )
    manifest = d.groupBy("shard_id").applyInPandas(
        _pack_shards(base), "shard_id int, n_samples long"
    )
    manifest.count()  # materialize: all shards written before the read
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(base)
    )
    return shards.select("path", "content").mapInPandas(
        _unpack_shards,
        "doc_id bigint, shard_id int, width int, height int, "
        "pixel_sum bigint, text_len int",
    )


@register(
    "data_mixture_sampler",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn,
             count(*) OVER (PARTITION BY source) AS n_natural
      FROM documents
    ),
    target AS (SELECT min(n_natural) AS n_target FROM (
      SELECT source, count(*) AS n_natural FROM documents GROUP BY 1)),
    kept AS (
      SELECT source, n_natural, doc_id
      FROM ranked CROSS JOIN target
      WHERE rn <= n_target
    )
    SELECT source, CAST(min(n_natural) AS BIGINT) AS n_natural,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS kept_checksum
    FROM kept GROUP BY 1
    """,
    tags=("sampling", "llm"),
)
def data_mixture_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture rebalancing — the 'mix N sources to a
    target distribution' step every pretraining run performs: here each
    source is downsampled to the SMALLEST source's size (a balanced
    mixture), selecting per source the docs with the smallest
    md5(doc_id) — a uniform, reproducible, engine-portable draw (the
    same md5-band idea as sample_fraction, but rank-based so the kept
    COUNT is exact, not binomial). Emits per-source natural size, kept
    size (equal across sources by construction), and a checksum of the
    kept set proving BOTH engines selected the identical documents.
    One window per source partition + a broadcast scalar target; at
    100 TB weights other than 'balanced' are a per-source rank
    threshold — same plan, different n_target arithmetic. Upsampling
    (rate > 1) composes with explode(sequence(1, ceil(rate))) on top of
    the same ranked draw."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wc = Window.partitionBy("source")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_natural"),
    )
    target = d.groupBy("source").count().agg(F.min("count").alias("n_target"))
    kept = ranked.crossJoin(F.broadcast(target)).filter(
        F.col("rn") <= F.col("n_target")
    )
    return kept.groupBy("source").agg(
        F.min("n_natural").alias("n_natural"),
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_checksum"),
    )
