"""Round-8 wave I: sparse lexical similarity join and the Theil index.

- ``sim_tfidf_cosine_topk``: doc-to-doc TF-IDF cosine top-k via the
  inverted-index similarity join — the sparse complement of the dense
  embedding path (sim_topk_cosine) and of query-to-doc BM25
  (text_bm25_topk). Term weights are integer micro-nat idf units
  (w = tf * iln-idf), so dot products and squared norms are exact
  BIGINTs; the cosine is ONE double division dot/(sqrt(na)*sqrt(nb)),
  rounded once — and IEEE-754 requires sqrt to be correctly rounded
  (unlike exp/ln), so the division is bit-identical cross-engine.
- ``stat_theil_index``: the Theil-T inequality index, companion to
  analytics_gini. T = sum(x*ln x)/S - ln S + ln n after expanding
  ln(x/mu) — every ln is of an INTEGER (micro-nat convention), the
  x*iln(x) accumulator rides DECIMAL(38,0), and one rounded division
  publishes micro-nats.

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# sim_tfidf_cosine_topk
# --------------------------------------------------------------------------

_TFIDF_TOPK = 25
_TFIDF_DF_CAP = 150

_TFIDF_SQL = f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE len(term) > 0
      GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    dfs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    wts AS (
      SELECT doc_id, tf.term,
             tf * (CAST(round(round(ln(n_docs), 6) * 1e6) AS BIGINT)
                   - CAST(round(round(ln(df), 6) * 1e6) AS BIGINT)) AS w
      FROM tf JOIN dfs ON dfs.term = tf.term CROSS JOIN nd
      WHERE df <= {_TFIDF_DF_CAP}
    ),
    norms AS (
      SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2
      FROM wts GROUP BY 1
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM wts a JOIN wts b ON b.term = a.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, dot,
           CAST(round(dot * 1000000.0 / (sqrt(na.n2) * sqrt(nb.n2)))
                AS BIGINT) AS cosine_micro
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    ORDER BY cosine_micro DESC, doc_a ASC, doc_b ASC
    LIMIT {_TFIDF_TOPK}
"""


@register(
    "sim_tfidf_cosine_topk", oracle=_TFIDF_SQL, tags=("similarity", "llm", "text")
)
def sim_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TFIDF_TOPK} most lexically similar document pairs by TF-IDF
    cosine, computed with the inverted-index similarity join: only
    pairs sharing a term are ever materialized, and terms with
    df > {_TFIDF_DF_CAP} are dropped from the index (the standard
    stop-term cap that keeps the join linear — a term in every doc
    contributes nothing to discrimination but O(n^2) pairs). Weights
    are integer micro-nat idf units, so dot and norms are exact; see
    module docstring for why the one sqrt+division is portable.

    Plan shape: tokenize scan -> (doc, term) partial agg -> df groupBy
    with broadcast back -> self-join keyed TERM (the inverted index) ->
    pair partial agg -> TakeOrderedAndProject. At 100 TB the df-cap is
    the load-bearing guard (probe-verified linear for the Jaccard
    sibling, dedup_jaccard_capped); the norms join is doc-grain."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))

    wts = (
        tf.join(F.broadcast(dfs.filter(F.col("df") <= _TFIDF_DF_CAP)), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * (iln(F.col("n_docs")) - iln(F.col("df")))).alias("w"),
        )
    )
    norms = wts.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    a = wts.alias("a")
    b = wts.alias("b")
    dots = (
        a.join(
            b,
            (F.col("b.term") == F.col("a.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            F.round(
                F.col("dot") * 1000000.0 / (F.sqrt("na2") * F.sqrt("nb2"))
            )
            .cast("bigint")
            .alias("cosine_micro"),
        )
    )
    return scored.orderBy(
        F.desc("cosine_micro"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(_TFIDF_TOPK)


# --------------------------------------------------------------------------
# stat_theil_index
# --------------------------------------------------------------------------

_THEIL_SQL = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             sum(CAST(cents AS HUGEINT)
                 * CAST(round(round(ln(cents), 6) * 1e6) AS BIGINT)) AS xlx
      FROM rev
    )
    SELECT n, s,
           (CAST(round(xlx * 1.0 / s) AS BIGINT)
            - CAST(round(round(ln(s), 6) * 1e6) AS BIGINT)
            + CAST(round(round(ln(n), 6) * 1e6) AS BIGINT)) AS theil_micro
    FROM agg
"""


@register("stat_theil_index", oracle=_THEIL_SQL, tags=("stats", "analytics"))
def stat_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of per-customer revenue, companion to
    analytics_gini: T = (1/n) sum (x_i/mu) ln(x_i/mu) expands to
    sum(x*ln x)/S - ln S + ln n, so every logarithm is of an INTEGER
    cents value (micro-nat convention) and the only float op is the
    final division of the DECIMAL-exact sum(x * iln(x)) accumulator by
    S, rounded once. Unlike Gini it needs NO rank window — Theil is a
    pure one-pass aggregate, which is why it is the inequality measure
    that actually scales (decomposable across groups, computable
    map-side).

    Bigint/decimal headroom: x*iln(x) ~ 1e7 * 1.6e7 = 1.6e14 per row;
    the accumulator rides DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so
    no practical row-count bound. Plan: one groupBy + one single-row
    reduce."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    agg = rev.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * iln(F.col("cents"))).alias(
            "xlx"
        ),
    )
    return agg.select(
        "n",
        "s",
        (
            F.round(F.col("xlx") * F.lit(1.0) / F.col("s")).cast("bigint")
            - iln(F.col("s"))
            + iln(F.col("n"))
        ).alias("theil_micro"),
    )
