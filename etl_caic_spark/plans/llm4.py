"""LLM-data-pipeline queries, part 4 (round 5): engine-portable twins for
the last two rows-only similarity families — md5-based SimHash and
integer-fixed-point IVF — completing the pattern set by dedup_minhash_md5:
every approximate-similarity family now has BOTH a speed configuration
(xxhash64 / double avg — rows-only + property pytest) and a
hash-matched DuckDB-oracled configuration proving the dataflow semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import dedup as D
from etl_caic_spark.operators import similarity as S
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "dedup_simhash_md5",
    oracle="""
    WITH w AS (
      SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    hv AS (
      SELECT doc,
             list_sum(list_transform(generate_series(1, 8), i ->
               CAST(strpos('0123456789abcdef', h[i]) - 1 AS BIGINT)
               * (CAST(1 AS BIGINT) << (4 * (8 - i))))) AS v
      FROM (SELECT doc, md5(word) AS h FROM w)
    ),
    bits AS (
      SELECT doc, b,
             sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hv, generate_series(0, 31) t(b)
      GROUP BY doc, b
    ),
    fp AS (
      SELECT doc,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS BIGINT) AS fp
      FROM bits GROUP BY doc
    ),
    blocks AS (
      SELECT doc, fp, k, (fp >> (8 * k)) & 255 AS bv
      FROM fp, generate_series(0, 3) t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                      a.fp AS fa, b.fp AS fb
      FROM blocks a JOIN blocks b
        ON a.k = b.k AND a.bv = b.bv AND a.doc < b.doc
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(fa, fb)) <= 3
    """,
    tags=("dedup", "llm", "simhash"),
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with engine-portable hashing
    (operators/dedup.simhash_pairs_md5): word hash = first 32 bits of
    md5(word), occurrence-level ±1 contributions, 4×8-bit pigeonhole
    blocks (complete for hamming ≤ 3), verified by bit_count(xor) — the
    FULLY ORACLED SimHash. The 63-bit xxhash64 fast path
    (`dedup_simhash`) keeps its rows-only + banding-completeness pytest
    as the 100 TB speed configuration."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs_md5(d, "doc_id", "text", max_hamming=3)


@register(
    "sim_topk_ivf_exact",
    oracle="""
    WITH c AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM c
          WHERE vec_id < 10),
    per_dim AS (
      SELECT label, d,
             CAST(sum(CAST(floor(e[d] * 1e6) AS BIGINT)) AS DOUBLE)
             / CAST(1000000 * count(*) AS DOUBLE) AS cval
      FROM c, generate_series(1, 64) t(d)
      GROUP BY label, d
    ),
    cent AS (
      SELECT label, list(cval ORDER BY d) AS ce
      FROM per_dim GROUP BY label
    ),
    cent_n AS (
      SELECT label, ce, sqrt(list_inner_product(ce, ce)) AS cn FROM cent
    ),
    probes AS (
      SELECT query_id, qe, qn, label
      FROM (
        SELECT q.query_id, q.qe, q.qn, cn.label,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_inner_product(q.qe, cn.ce)
                                / (q.qn * cn.cn), 6) DESC, cn.label
               ) AS pr
        FROM q CROSS JOIN cent_n cn
      )
      WHERE pr <= 2
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id
           ) AS BIGINT) AS rank
    FROM (
      SELECT p.query_id, c.vec_id,
             round(list_inner_product(p.qe, c.e) / (p.qn * c.nrm), 6)
               AS cosine
      FROM probes p JOIN c ON c.label = p.label
      WHERE c.vec_id <> p.query_id
    )
    QUALIFY rank <= 5
    """,
    tags=("similarity", "llm", "ann"),
)
def sim_topk_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF partition-pruned top-5 with EXACT (integer fixed-point)
    centroids — the oracled IVF (operators/similarity.ivf_topk with
    exact_centroids=True): per-dim centroid sums reduce exactly in BIGINT
    (floor(x·1e6)), one double division at the end, probe similarity
    rounded before ranking. The plan shape is identical to the
    production `sim_topk_ivf` (broadcast centroids, equi-join partition
    pruning, per-query top-k window) — this twin proves the probe/prune
    semantics hash-exactly while the double-avg variant keeps the
    recall-vs-brute-force pytest."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    return S.ivf_topk(queries, e, k=5, nprobe=2, exact_centroids=True)
