"""Round-10 wave A (file wave14a): ANN recall audits — the in-registry
quality gates for the PQ and IVF approximate-search families.

Every approximate family in the engine pairs with an oracled audit that
measures its quality against exact ground truth IN the registry (not
just in a docstring probe): MinHash has eval_minhash_quality
(plans/wave8h.py); this wave adds the two missing siblings the round-9
verdict called out:

- ``eval_pq_recall``: does the PQ ADC shortlist (sim_pq_adc,
  plans/wave10a.py — integer-frozen codebooks, BIGINT micro^2 ADC
  scores) actually contain the true nearest neighbors? Recall@10 of
  the exact top-10 against shortlist membership, integer-exact. The
  wave10a docstring reported 9/10 from an ad-hoc probe; this promotes
  that number to a hash-oracled, regression-guarded query.
- ``eval_ivf_recall``: per-query recall@5 of the IVF partition-pruned
  search (sim_topk_ivf_exact's plan — exact fixed-point centroids,
  nprobe=2) against the brute-force cosine top-5. Pruning to 2 of 4
  label cells is the whole point of IVF; this measures exactly what
  that pruning costs, per query.

Exactness: both audits compose ALREADY-ORACLED constructions (the PQ
CTE prefix is imported from wave10a — the audit certifies the same
string the serving query runs; the IVF and brute-force legs replicate
the sim_topk_ivf_exact / sim_topk_cosine oracle CTEs), so membership
tests are integer/rounded-before-rank comparisons with no new float
surface. Published rates are one rounded division each; raw hit counts
ride along for auditability.

Scale shape: the exact legs are the audit's cost by definition — the
PQ truth leg is one broadcast-query scan over the corpus (O(n), no
shuffle keyed by anything but vec_id), the IVF truth leg is the
brute-force broadcast-query scan, both the "run the audit on a
stratified sample at 100 TB while serving runs on the full corpus"
pattern established by eval_minhash_quality. Hit counting joins two
top-k frames (constant rows) — broadcast.

Reference parity: the reference (task.ts:88-189) has no similarity
surface — SURVEY §2.C extension mandate (quality audits for every
approximate operator family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import similarity as S
from etl_caic_spark.plans.wave10a import _PQ_TOPK, PQ_CTES, pq_shortlist_frames
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_PQ_RECALL_SQL = f"""
    WITH {PQ_CTES},
    exact AS (
      SELECT v.vec_id,
             CAST(sum((v.x - q.x) * (v.x - q.x)) AS BIGINT) AS exact_micro2
      FROM sub v JOIN q ON q.s = v.s AND q.d = v.d
      WHERE v.vec_id <> 0
      GROUP BY 1
      ORDER BY exact_micro2, v.vec_id
      LIMIT {_PQ_TOPK}
    ),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_true,
             (SELECT CAST(count(*) AS BIGINT) FROM short) AS n_shortlist,
             (SELECT CAST(count(*) AS BIGINT)
              FROM exact e JOIN short s ON s.vec_id = e.vec_id) AS n_hit
    )
    SELECT n_true, n_shortlist, n_hit,
           CAST(round(n_hit * 1000000.0 / n_true) AS BIGINT) AS recall_micro
    FROM m
"""


@register(
    "eval_pq_recall", oracle=_PQ_RECALL_SQL, tags=("similarity", "eval", "llm")
)
def eval_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 audit of the PQ ADC shortlist (module docstring):
    exact top-10 neighbors of the vec_id=0 query by BIGINT micro^2
    distance, counted against membership in the 100-row ADC shortlist
    sim_pq_adc reranks. One row: n_true / n_shortlist / n_hit plus the
    rounded recall rate — quantifying what the M*K-codeword compression
    loses BEFORE the exact rerank repairs ranking within the shortlist.

    Plan shape: pq_shortlist_frames (wave10a) is the serving pipeline
    verbatim; the truth leg is one broadcast-query scan reduced per
    vec_id and a TakeOrderedAndProject top-10; hit counting is a
    broadcast join of two constant-size frames reduced to one row."""
    sub, q, short = pq_shortlist_frames(spark, sf_dir)
    exact = (
        sub.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), ["s", "d"])
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")))
            .cast("bigint")
            .alias("exact_micro2")
        )
        .orderBy(F.asc("exact_micro2"), F.asc("vec_id"))
        .limit(_PQ_TOPK)
    )
    # single-job assembly (r12, the eval_minhash_quality lesson): all
    # three counts from ONE full outer join of the 10-row exact top-k
    # and the 100-row shortlist, so `exact` and `short` each feed
    # exactly one plan subtree and execute exactly once — no
    # checkpoints, no count-leg re-runs of the distance aggregate.
    e = exact.select("vec_id", F.lit(1).alias("in_true"))
    s = short.select("vec_id", F.lit(1).alias("in_short"))
    m = e.join(s, "vec_id", "full_outer").agg(
        F.count("in_true").cast("bigint").alias("n_true"),
        F.count("in_short").cast("bigint").alias("n_shortlist"),
        F.count(
            F.when(
                F.col("in_true").isNotNull() & F.col("in_short").isNotNull(),
                1,
            )
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    return m.select(
        "n_true",
        "n_shortlist",
        "n_hit",
        F.round(F.col("n_hit") * 1000000.0 / F.col("n_true"))
        .cast("bigint")
        .alias("recall_micro"),
    )


_IVF_RECALL_SQL = """
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
    ),
    ivf AS (
      SELECT query_id, vec_id
      FROM (
        SELECT p.query_id, c.vec_id,
               round(list_inner_product(p.qe, c.e) / (p.qn * c.nrm), 6)
                 AS cosine
        FROM probes p JOIN c ON c.label = p.label
        WHERE c.vec_id <> p.query_id
      )
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= 5
    ),
    bf AS (
      SELECT query_id, vec_id
      FROM (
        SELECT q.query_id, c.vec_id,
               round(list_inner_product(q.qe, c.e) / (q.qn * c.nrm), 6)
                 AS cosine
        FROM q JOIN c ON c.vec_id <> q.query_id
      )
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= 5
    )
    SELECT b.query_id, CAST(count(i.vec_id) AS BIGINT) AS n_hit,
           CAST(round(count(i.vec_id) * 1000000.0 / 5) AS BIGINT)
             AS recall_micro
    FROM bf b LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.vec_id = b.vec_id
    GROUP BY b.query_id
"""


@register(
    "eval_ivf_recall", oracle=_IVF_RECALL_SQL, tags=("similarity", "eval", "llm")
)
def eval_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 audit of IVF partition pruning (module
    docstring): the exact-centroid IVF top-5 (sim_topk_ivf_exact's
    plan — nprobe=2 of 4 label cells) counted against the brute-force
    cosine top-5, for each of the 10 query vectors. 10 rows:
    query_id / n_hit / recall rate — the per-query distribution is the
    point (a mean can hide one query whose true neighbors all live in
    unprobed cells).

    Plan shape: both legs are existing oracled constructions
    (operators/similarity.ivf_topk exact variant + brute_force_topk);
    hit counting left-joins two 50-row frames and reduces per query —
    broadcast territory. At 100 TB the audit runs on a query sample;
    the serving path is untouched."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    ivf = S.ivf_topk(queries, e, k=5, nprobe=2, exact_centroids=True).select(
        "query_id", "vec_id", F.lit(1).alias("_m")
    )
    bf = S.brute_force_topk(queries, e, k=5).select("query_id", "vec_id")
    return (
        bf.join(F.broadcast(ivf), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_m").cast("bigint").alias("n_hit"))
        .select(
            "query_id",
            "n_hit",
            F.round(F.col("n_hit") * 1000000.0 / 5)
            .cast("bigint")
            .alias("recall_micro"),
        )
    )
