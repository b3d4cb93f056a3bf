"""Wave 32 (round 5): the THIRD flagship — a multimodal training-prep
pipeline composing the engine's curation stages end-to-end: quality
gate (composite score vs corpus percentile) → exact content dedup →
token packing into fixed-budget bins → join of per-document IMAGE
features computed through the REAL PNG codec. This is the
storage-to-trainer path a multimodal corpus actually takes, and every
stage is the registered operator's logic, so the end-to-end DuckDB
oracle (one chained SQL statement) hash-proves the COMPOSITION, not
just the pieces — same proof style as corpus_curation_pipeline and
clickstream_pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.multimodal import python_fanout
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_BUDGET = 2048


@register(
    "mm_training_prep_pipeline",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text,
             round(least(len(string_split(text, ' ')) / 60.0, 1.0) * 0.4
                   + (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))) * 0.4
                   + (1 - len(list_filter(string_split(text, ' '),
                        w -> list_contains(['a','the','of','to','and','row','key'], w)))
                        * 1.0 / len(string_split(text, ' '))) * 0.2, 6) AS q
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE q >= (SELECT round(quantile_cont(q, 0.25), 6) FROM scored)
    ),
    deduped AS (
      SELECT doc_id, lang, q, n_tokens FROM (
        SELECT doc_id, lang, q,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rk
        FROM gated
      ) WHERE rk = 1
    ),
    packed AS (
      SELECT doc_id, lang, q, n_tokens,
             CAST(doc_id % 8 AS BIGINT) AS shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY doc_id % 8 ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM deduped
    ),
    px AS (
      SELECT doc_id,
             CAST(sum((doc_id * 2654435761 + i.i * 1103515245 + 12345) % 256)
                  AS BIGINT) AS pixel_sum
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, 1023)) AS i) i
      GROUP BY 1
    )
    SELECT p.doc_id, p.lang, p.q AS quality_score, p.n_tokens,
           p.shard,
           CAST(p.cum_before // 2048 AS BIGINT) AS bin,
           CAST(p.cum_before % 2048 AS BIGINT) AS offset_in_bin,
           px.pixel_sum
    FROM packed p JOIN px ON px.doc_id = p.doc_id
    """,
    tags=("pipeline", "multimodal", "llm", "flagship"),
)
def mm_training_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal training-prep flagship, end-to-end: (1) QUALITY GATE —
    the composite score (length/diversity/stopword mix,
    operators/text_analysis.quality_features) thresholded at the corpus
    25th percentile; (2) EXACT DEDUP — md5-of-content keep-min-id over
    the survivors (this clean fixture has no exact dups, so the stage
    passes everything through — stated, not hidden; the operator still
    executes); (3) TOKEN PACKING — survivors stream into 2048-token
    bins per shard in doc_id order (text_pack_sequences' greedy
    layout); (4) IMAGE FEATURES — each document's 32×32 image goes
    through the REAL PNG encode→decode (multimodal_patchify's batches)
    and its patch sums aggregate to the pixel total joined onto the
    packed manifest. The single chained oracle replays all four stages
    declaratively — a hash match proves the composition: the gate fed
    the dedup fed the packer, and the codec roundtrip was lossless.

    Scale: quality+dedup are one scan + one content-hash shuffle;
    packing shuffles once on the shard key (the window is per-shard,
    bounded); the codec stage is Arrow-batched mapInPandas,
    partition-parallel, joined back on the doc key. No stage
    materializes the corpus on the driver; every shuffle key is
    explicit. This is the pipeline shape that writes
    multimodal_tar_shards' input manifest."""
    from etl_caic_spark.operators.text_analysis import quality_features
    from etl_caic_spark.plans.multimodalq3 import _PATCH_OUT, _patch_batches

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        quality_features(F.col("text"))["quality_score"].alias("q"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    scored.createOrReplaceTempView("mm_prep_scored_tmp")
    gated = spark.sql(
        """
        SELECT * FROM mm_prep_scored_tmp
        WHERE q >= (SELECT round(percentile(q, 0.25), 6)
                    FROM mm_prep_scored_tmp)
        """
    )
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("rk", F.row_number().over(wdup))
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", "q", "n_tokens")
    )
    wpack = Window.partitionBy(F.col("doc_id") % 8).orderBy("doc_id")
    packed = deduped.select(
        "doc_id",
        "lang",
        "q",
        "n_tokens",
        (F.col("doc_id") % 8).cast("bigint").alias("shard"),
        F.coalesce(
            F.sum("n_tokens").over(wpack.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    patches = python_fanout(d.select("doc_id")).mapInPandas(_patch_batches, _PATCH_OUT)
    px = patches.groupBy("doc_id").agg(
        F.sum("patch_sum").cast("bigint").alias("pixel_sum")
    )
    return packed.join(px, "doc_id").select(
        "doc_id",
        "lang",
        F.col("q").alias("quality_score"),
        "n_tokens",
        "shard",
        F.floor(F.col("cum_before") / _BUDGET).cast("bigint").alias("bin"),
        (F.col("cum_before") % _BUDGET).cast("bigint").alias("offset_in_bin"),
        "pixel_sum",
    )
