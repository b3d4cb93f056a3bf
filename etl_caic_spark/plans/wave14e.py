"""Round-10 wave E (file wave14e): rendezvous-hash shard assignment.

``data_rendezvous_shard``: highest-random-weight (rendezvous)
  hashing — THE stable shard-assignment primitive for a 100 TB
  pipeline: each document goes to argmax over shards of
  md5(shard || '|' || doc_id), so when the shard count changes only
  ~1/N of keys move (modulo hashing moves nearly all of them — the
  reshuffle a petabyte re-shard cannot afford). The weight draw is the
  registry's portable md5 convention (dedup_minhash_md5,
  eval_ndcg_at_k's pseudo-score), so assignment is hash-verifiable
  cross-engine; the output is per-shard placement counts plus min/max
  doc ids for spot audits, and the balance is auditable (md5 weights
  are uniform, so shard loads concentrate near N/shards).

Scale shape: rendezvous is a generate-N-weights projection (N = shard count, a literal array —
no explode needed at small N; expressed as a posexplode over the shard
id range to keep N a parameter) followed by an argmax per doc via
max(struct(weight, shard)) — one map-side-combinable groupBy, no
window, no join.

Reference parity: the reference (task.ts:88-189) has no placement
surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_RVZ_SHARDS = 16

_RVZ_SQL = f"""
    WITH w AS (
      SELECT doc_id, g.s AS shard,
             md5(CAST(g.s AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))
               AS weight
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, {_RVZ_SHARDS - 1}))
                    AS s) g
    ),
    placed AS (
      SELECT doc_id,
             CAST(max_by(shard, weight || '|'
                  || lpad(CAST(shard AS VARCHAR), 2, '0')) AS BIGINT)
               AS shard
      FROM w GROUP BY doc_id
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM placed GROUP BY shard
"""


@register(
    "data_rendezvous_shard", oracle=_RVZ_SQL, tags=("data", "scale", "llm")
)
def data_rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment over
    16 shards (_RVZ_SHARDS; module docstring): per doc, argmax over
    shards of the portable md5 weight — shard-count changes move only
    ~1/N of keys, the property modulo hashing lacks. Ties (impossible
    in practice for md5, but the argmax must still be total) break on
    the ZERO-PADDED shard id appended to the weight string — the
    identical lexicographic key on both engines (DuckDB max_by takes no
    composite key, so the tiebreak lives inside the string).

    Plan: posexplode over the shard range (a 16x projection,
    whole-stage codegen), argmax via max(struct(weight, shard)) — one
    map-side-combinable groupBy per doc, one per-shard rollup. No join,
    no window."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    w = d.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.lit(i) for i in range(_RVZ_SHARDS)])
        ).alias("_", "shard"),
    ).select(
        "doc_id",
        "shard",
        F.md5(
            F.concat(
                F.col("shard").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ).alias("weight"),
    )
    key = F.concat(
        F.col("weight"),
        F.lit("|"),
        F.lpad(F.col("shard").cast("string"), 2, "0"),
    )
    placed = w.groupBy("doc_id").agg(
        F.max(F.struct(key.alias("k"), F.col("shard")))
        .getField("shard")
        .cast("bigint")
        .alias("shard")
    )
    return placed.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )
