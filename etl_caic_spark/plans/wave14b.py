"""Round-10 wave B (file wave14b): mean reciprocal rank and
Jensen-Shannon divergence — two family-completing metrics.

- ``eval_mrr``: the retrieval-eval trio (NDCG round6b, P/R@k round6b)
  was missing ITS most-quoted member. Per customer the order list is
  the candidate set, a keyed-md5 pseudo-score plays the learned ranker
  (the eval_ndcg_at_k convention) and relevance is binary URGENT
  priority; the reciprocal of the first relevant rank freezes to
  integer micro per query BEFORE the corpus mean (one rounded division
  at the end) — the registry's order-free-summation discipline.

- ``stat_js_divergence``: the drift family (PSI, KS, chi-square,
  Benford) lacked the symmetric, always-finite divergence that
  corpus-mixture work actually quotes (KL blows up on unseen words;
  JSD is bounded by ln 2). Between two document sources' word
  distributions, every log term is a micro-nat over INTEGER arguments:
  with p = c1/N1, q = c2/N2, m = (p+q)/2,
      ln(p/m) = ln(2*c1*N2) - ln(c1*N2 + c2*N1)
  — products of counts, so the shared iln freeze
  (operators/micronat.py) applies verbatim and the weighted sums run
  in exact BIGINT (count * micronat ~ 1e11 per word at fixture scale;
  past ~1e18 move the two products onto the DECIMAL(38) ladder the
  Krippendorff query already uses). Absent words contribute only
  through the side that has them (the other side's p is 0 and
  0*ln(0/m) = 0), which the full-outer join + zero-guard encodes.

Scale shape: MRR is one customer-partitioned rank window (Spark 4
WindowGroupLimit keeps it a per-group top-k scan) and two bounded
aggregates; JSD is two token groupBys (linear, map-side combinable), a
vocab-grain full-outer equi-join, two broadcast scalar totals, and a
one-row reduce — no window anywhere, nothing keyed by more than the
word.

Reference parity: the reference (task.ts:88-189) has no eval/stat
surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_MRR_SALT = "mrr-v1|"


def _pseudo_score(col, salt: str):
    """Keyed-md5 stand-in for a learned ranker (round6b convention)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


_MRR_SQL = """
    WITH ranked AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS rel,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(('0x' || substr(md5('mrr-v1|'
                         || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                        DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ),
    per_q AS (
      SELECT o_custkey,
             min(CASE WHEN rel = 1 THEN rn END) AS first_rel
      FROM ranked GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count(first_rel) AS BIGINT) AS n_hit,
           CAST(round(sum(coalesce(
             CAST(round(1000000.0 / first_rel) AS BIGINT), 0)) * 1.0
             / count(*)) AS BIGINT) AS mrr_micro
    FROM per_q
"""


@register("eval_mrr", oracle=_MRR_SQL, tags=("eval", "ml", "retrieval"))
def eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus MRR (module docstring): per customer, rank orders by the
    keyed-hash pseudo-score, take the reciprocal of the first URGENT
    order's rank (0 when none), average. Reciprocals freeze to integer
    micro per query; the mean is one rounded division.

    Plan: one customer-partitioned row_number window, a per-customer
    min, a one-row reduce — the standard offline ranking-eval shape
    (shuffle on the query key only)."""
    ranked = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("rel"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                _pseudo_score(F.col("o_orderkey"), _MRR_SALT).desc(),
                F.col("o_orderkey"),
            )
        )
        .cast("bigint")
        .alias("rn"),
    )
    per_q = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel")
    )
    return per_q.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.count("first_rel").cast("bigint").alias("n_hit"),
        F.round(
            F.sum(
                F.coalesce(
                    F.round(1000000.0 / F.col("first_rel")).cast("bigint"),
                    F.lit(0),
                )
            )
            * 1.0
            / F.count("*")
        )
        .cast("bigint")
        .alias("mrr_micro"),
    )


_JSD_A = "src0"
_JSD_B = "src1"

_JSD_SQL = f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE source IN ('{_JSD_A}', '{_JSD_B}')
    ),
    ca AS (SELECT word, CAST(count(*) AS BIGINT) AS c1 FROM tok
           WHERE source = '{_JSD_A}' GROUP BY 1),
    cb AS (SELECT word, CAST(count(*) AS BIGINT) AS c2 FROM tok
           WHERE source = '{_JSD_B}' GROUP BY 1),
    tot AS (
      SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM ca) AS n1,
             (SELECT CAST(sum(c2) AS BIGINT) FROM cb) AS n2
    ),
    joined AS (
      SELECT coalesce(ca.c1, 0) AS c1, coalesce(cb.c2, 0) AS c2, n1, n2
      FROM ca FULL OUTER JOIN cb ON ca.word = cb.word
      CROSS JOIN tot
    ),
    terms AS (
      SELECT
        CASE WHEN c1 > 0 THEN c1 *
          (CAST(round(round(ln(2 * c1 * n2), 6) * 1e6) AS BIGINT)
           - CAST(round(round(ln(c1 * n2 + c2 * n1), 6) * 1e6) AS BIGINT))
        ELSE 0 END AS t1,
        CASE WHEN c2 > 0 THEN c2 *
          (CAST(round(round(ln(2 * c2 * n1), 6) * 1e6) AS BIGINT)
           - CAST(round(round(ln(c1 * n2 + c2 * n1), 6) * 1e6) AS BIGINT))
        ELSE 0 END AS t2,
        n1, n2
      FROM joined
    )
    SELECT max(n1) AS n1_tokens, max(n2) AS n2_tokens,
           CAST(round(sum(t1) / (2.0 * max(n1))
                      + sum(t2) / (2.0 * max(n2))) AS BIGINT)
             AS jsd_micronat
    FROM terms
"""


@register("stat_js_divergence", oracle=_JSD_SQL, tags=("stat", "drift", "llm"))
def stat_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the word distributions of two
    document sources (module docstring: every log term is a micro-nat
    over integer count products, so the sum is exact BIGINT and the
    published value is one rounded division per side; 0 for identical
    mixtures, 693147 = ln 2 micro-nats for disjoint vocabularies).

    Plan: token-grain groupBys (map-side combinable), a vocab-grain
    full-outer join, the two totals broadcast as a one-row frame, one
    reduce."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(_JSD_A, _JSD_B)
    )
    tok = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    ca = (
        tok.where(F.col("source") == _JSD_A)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    cb = (
        tok.where(F.col("source") == _JSD_B)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c2"))
    )
    tot = ca.agg(F.sum("c1").cast("bigint").alias("n1")).crossJoin(
        cb.agg(F.sum("c2").cast("bigint").alias("n2"))
    )
    joined = (
        ca.join(cb, "word", "full_outer")
        .select(
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        .crossJoin(F.broadcast(tot))
    )
    mix = iln(F.col("c1") * F.col("n2") + F.col("c2") * F.col("n1"))
    t1 = F.when(
        F.col("c1") > 0,
        F.col("c1") * (iln(2 * F.col("c1") * F.col("n2")) - mix),
    ).otherwise(F.lit(0))
    t2 = F.when(
        F.col("c2") > 0,
        F.col("c2") * (iln(2 * F.col("c2") * F.col("n1")) - mix),
    ).otherwise(F.lit(0))
    return joined.select(
        t1.alias("t1"), t2.alias("t2"), "n1", "n2"
    ).agg(
        F.max("n1").alias("n1_tokens"),
        F.max("n2").alias("n2_tokens"),
        F.round(
            F.sum("t1") / (2.0 * F.max("n1"))
            + F.sum("t2") / (2.0 * F.max("n2"))
        )
        .cast("bigint")
        .alias("jsd_micronat"),
    )
