"""LLM-data queries, part 8: cosine RANGE search — the radius-query
variant of the similarity family (sim_topk_* return the k nearest;
range search returns EVERYTHING within a similarity threshold, the
primitive behind near-duplicate mining at a fixed distance budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.similarity import cosine, with_norm
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "sim_range_search",
    oracle="""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), q AS (SELECT * FROM n WHERE vec_id % 100 = 0)
    SELECT q.vec_id AS query_id, c.vec_id AS match_id,
           CAST(round(list_inner_product(q.e, c.e) / (q.nrm * c.nrm)
                      * 1000000) AS BIGINT) AS cos_micro
    FROM q JOIN n c ON c.vec_id <> q.vec_id
    WHERE CAST(round(list_inner_product(q.e, c.e) / (q.nrm * c.nrm)
                     * 1000000) AS BIGINT) >= 300000
    """,
    tags=("llm", "ann", "similarity"),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search: all corpus vectors with similarity >= 0.3
    of each query vector (every 100th vector), similarity quantized to
    integer micros BEFORE thresholding so both engines keep the same
    boundary rows. Uses the proven cosine construction of
    operators/similarity (same IEEE reduce as DuckDB's
    list_inner_product).

    Plan: broadcast the 1% query side, one scan of the corpus with a
    JVM-codegen fold per pair — the brute-force anchor for radius
    queries; at scale sim_lsh_cosine's bucket join generates
    candidates and THIS predicate verifies survivors (the
    anchor-plus-pruned contract the geo family documents).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    n = with_norm(emb).select(
        "vec_id", F.col("_vec").alias("e"), F.col("_norm").alias("nrm")
    )
    q = n.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    cos_micro = F.round(
        cosine(F.col("qe"), F.col("qnrm"), F.col("e"), F.col("nrm"))
        * F.lit(1000000)
    ).cast("bigint")
    return (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            cos_micro.alias("cos_micro"),
        )
        .filter(F.col("cos_micro") >= 300000)
    )
