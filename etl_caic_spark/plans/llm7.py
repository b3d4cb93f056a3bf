"""Wave 38 (round 5): incremental ingest dedup — the gate every
continuously-growing corpus runs on arrival: an incoming batch is
admitted only where its content fingerprint is (a) unseen in the
historical corpus and (b) unique within the batch itself (keep-min).
Distinct from dedup_exact (whole-corpus, one-shot): this is the
STREAMING-SHAPED membership test against accumulated state, expressed
as two hash-keyed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "dedup_incremental_ingest",
    oracle="""
    WITH corpus AS (
      SELECT md5(text) AS h FROM documents WHERE doc_id < 400 GROUP BY 1
    ),
    incoming AS (
      -- the batch re-sends some historical content verbatim (every 7th
      -- incoming doc carries an old doc's text) plus intra-batch dups
      SELECT n.doc_id,
             CASE WHEN n.doc_id % 7 = 0
                  THEN (SELECT o.text FROM documents o
                        WHERE o.doc_id = n.doc_id % 400)
                  WHEN n.doc_id % 11 = 0
                  THEN (SELECT o.text FROM documents o
                        WHERE o.doc_id = 400 + (n.doc_id % 5))
                  ELSE n.text END AS text
      FROM documents n WHERE n.doc_id >= 400
    ),
    keyed AS (
      SELECT doc_id, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rk
      FROM incoming
    )
    SELECT k.doc_id, k.h,
           CAST(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS seen_before,
           CAST(CASE WHEN k.rk > 1 THEN 1 ELSE 0 END AS INT) AS batch_dup,
           CAST(CASE WHEN c.h IS NULL AND k.rk = 1 THEN 1 ELSE 0 END AS INT)
             AS admitted
    FROM keyed k LEFT JOIN corpus c ON c.h = k.h
    """,
    tags=("dedup", "llm", "pipeline"),
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest gate: the corpus's content fingerprints (md5)
    form the membership state; an incoming batch — deterministically
    salted with re-sent historical texts (every 7th doc) and
    intra-batch duplicates (every 11th) so both rejection paths
    actually fire — is admitted per document only if its fingerprint
    misses the corpus set AND it is the batch's keep-min
    representative. The output is the full AUDIT (seen_before /
    batch_dup / admitted per doc), not just the survivors, because
    ingest gates must explain every rejection.

    Scale: the corpus side reduces to DISTINCT fingerprints — at 100 TB
    that is the compact state a bloom filter approximates first
    (sketch_bloom_membership is the probabilistic prefilter; this join
    is the exact confirm) — and both joins key on the fingerprint the
    sides already shuffle on. The streaming twin is
    dropDuplicatesWithinWatermark (stream_dedup) with the corpus as
    initial state."""
    d = load_table(spark, sf_dir, "documents")
    corpus = (
        d.where(F.col("doc_id") < 400)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    old_a = d.select(F.col("doc_id").alias("oa"), F.col("text").alias("ta"))
    old_b = d.select(F.col("doc_id").alias("ob"), F.col("text").alias("tb"))
    incoming = (
        d.where(F.col("doc_id") >= 400)
        .join(old_a, F.col("oa") == F.col("doc_id") % 400, "left")
        .join(old_b, F.col("ob") == 400 + (F.col("doc_id") % 5), "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.col("ta"))
            .when(F.col("doc_id") % 11 == 0, F.col("tb"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    keyed = incoming.select(
        "doc_id", F.md5("text").alias("h")
    ).withColumn(
        "rk", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    )
    out = keyed.join(F.broadcast(corpus), "h", "left")
    return out.select(
        "doc_id",
        "h",
        F.when(F.col("seen").isNotNull(), 1).otherwise(0).cast("int").alias(
            "seen_before"
        ),
        F.when(F.col("rk") > 1, 1).otherwise(0).cast("int").alias("batch_dup"),
        F.when(F.col("seen").isNull() & (F.col("rk") == 1), 1)
        .otherwise(0)
        .cast("int")
        .alias("admitted"),
    )
