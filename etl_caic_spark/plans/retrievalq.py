"""Retrieval-scoring queries over the `documents` table: BM25 ranked
retrieval, PMI bigram collocations, and asymmetric containment dedup.

These extend the TF-IDF/contamination surface (plans/llm2.py) with the
ranking side of a training-data search stack: BM25 is the standard
lexical retriever used to mine hard negatives / curate pre-training
subsets; PMI finds collocations worth preserving as single tokens; and
containment (|A∩B|/|A|) catches near-superset duplicates that symmetric
Jaccard (dedup_ngram_jaccard, plans/llm.py) under-scores when one doc
embeds another.

Float discipline: every per-term weight is a deterministic scalar IEEE
expression over exact integer counts, immediately quantized to BIGINT
micros (round(x*1e6)); cross-row sums then happen in integer space, so
the driver's value-hash comparison is exact regardless of summation
order. Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import widen_narrow_scan


@register(
    "text_bm25_topk",
    oracle="""
    WITH tfx AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             sum(dl) * 1.0 / count(*) AS avgdl
      FROM dl
    ), dfs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfx GROUP BY 1
    ), qterms AS (
      SELECT term FROM tfx GROUP BY term
      ORDER BY sum(tf) DESC, term ASC LIMIT 10
    ), w AS (
      SELECT tfx.doc_id,
             CAST(round(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               * 1000000) AS BIGINT) AS w_micro
      FROM tfx
      JOIN qterms USING (term)
      JOIN dfs ON tfx.term = dfs.term
      JOIN dl ON tfx.doc_id = dl.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, CAST(sum(w_micro) AS BIGINT) AS score_micro
    FROM w GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id ASC LIMIT 20
    """,
    tags=("text", "llm", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-20 retrieval for the corpus's 10
    heaviest terms as the query.

    Plan shape: one explode→groupBy for tf (partial-aggregated), tiny
    broadcast dims for df / query terms / corpus stats (vocab-sized and
    scalar — broadcastable at any corpus size), integer-micro weights
    summed per doc, global top-20 via sort+limit (Spark's
    TakeOrderedAndProject — no full sort materialization). At 100 TB the
    only shuffles are the two term groupBys, both linear in token count;
    per-term weights stay JVM-side whole-stage codegen.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    qterms = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("_tot"))
        .orderBy(F.col("_tot").desc(), F.col("term").asc())
        .limit(10)
        .select("term")
    )
    w_micro = F.round(
        F.log(
            F.lit(1)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
        * F.lit(1000000)
    ).cast("bigint")
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", w_micro.alias("w_micro"))
        .groupBy("doc_id")
        .agg(F.sum("w_micro").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "text_pmi_bigrams",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(ws) AS w FROM words) GROUP BY 1
    ), bi AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
      FROM (
        SELECT ws[i] AS a, ws[i + 1] AS b
        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM words)
      ) GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS u,
             (SELECT CAST(sum(c_ab) AS BIGINT) FROM bi) AS t
      FROM uni
    )
    SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
           round(ln(c_ab * 1.0 * u * u / (t * ua.c * ub.c)), 6) AS pmi
    FROM bi
    JOIN uni ua ON bi.a = ua.w
    JOIN uni ub ON bi.b = ub.w
    CROSS JOIN tot
    WHERE c_ab >= 5
    """,
    tags=("text", "llm", "retrieval"),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs (collocation
    mining): pmi = ln(P(ab) / (P(a)P(b))) with P(ab)=c_ab/T bigrams and
    P(a)=c_a/U unigrams, min count 5.

    Bigrams come from zipping the word array against its tail
    (slice+arrays_zip — no positional self-join, no shuffle to form
    pairs); unigram/bigram totals are scalar broadcasts and the c_a/c_b
    lookups broadcast the vocabulary-sized unigram table. Everything is
    integer counts until the single deterministic ln() per output row.
    Linear in token count at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.split("text", " ").alias("ws"))
    pairs = words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("a"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bi = pairs.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("c_ab"))
    uni = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("u")).crossJoin(
        bi.agg(F.sum("c_ab").cast("bigint").alias("t"))
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    return (
        bi.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.lit(1.0)
                    * F.col("u")
                    * F.col("u")
                    / (F.col("t") * F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "dedup_containment",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id % 2 = 0
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
            FROM words)
    ), sh AS (
      SELECT doc_id, shingle
      FROM (SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM sh0)
      WHERE df <= 100
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
    ), inter AS (
      SELECT x.doc_id AS a_id, y.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_inter,
           sa.n_sh AS n_a, sb.n_sh AS n_b
    FROM inter
    JOIN sizes sa ON inter.a_id = sa.doc_id
    JOIN sizes sb ON inter.b_id = sb.doc_id
    WHERE n_inter * 10 >= least(sa.n_sh, sb.n_sh) * 8
    """,
    tags=("text", "dedup"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: pairs where the smaller doc's
    3-gram shingle set is >=80% contained in the other's
    (n_inter/min(|A|,|B|) >= 0.8, compared by exact integer
    cross-multiplication — no float ratio).

    Catches doc-embeds-doc near-duplicates that symmetric Jaccard
    misses: a doc fully contained in a 10x larger doc has Jaccard ~0.1
    but containment 1.0. Candidate pairs come only from the shingle
    equi-join (shuffle on shingle hash — no all-pairs), and STOP
    SHINGLES (df > 100) are dropped before the join — the same guard as
    dedup_jaccard_capped (operators/dedup.py max_shingle_df): a hot
    boilerplate shingle shared by k docs would otherwise emit k^2
    candidate pairs, the quadratic that kills shingle joins on real
    corpora. NOTE the cap also changes what "containment" means here:
    intersection/size count only NON-stop shingles (both engines and
    the size table agree on that definition). Sizes join back by doc_id
    (bounded, one row per doc).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    # Guard: F.sequence(0, size-3) on a <3-word doc would run DESCENDING
    # (Spark sequences count down when end < start); DuckDB's
    # generate_series is simply empty there, so filter short docs out
    # explicitly to keep both sides identical.
    # widen: single-file scan -> one partition; the shingle explode +
    # distinct map side would otherwise run single-task
    words = widen_narrow_scan(d).select(
        "doc_id", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= 3)
    sh0 = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("ws", i + 1),
                    F.element_at("ws", i + 2),
                    F.element_at("ws", i + 3),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    sh = (
        sh0.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= 100)
        .drop("df")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_sh"))
    x = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    y = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        x.join(y, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(F.col("n_inter") * 10 >= F.least("n_a", "n_b") * 8)
        .select("a_id", "b_id", "n_inter", "n_a", "n_b")
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH counts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1
    ), ranked AS (
      SELECT term, c,
             CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS BIGINT)
               AS rnk
      FROM counts
    ), q AS (
      SELECT CAST(round(ln(rnk) * 1000000) AS BIGINT) AS xq,
             CAST(round(ln(c) * 1000000) AS BIGINT) AS yq
      FROM ranked
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
             CAST(sum(xq * yq) AS BIGINT) AS sxy,
             CAST(sum(xq * xq) AS BIGINT) AS sxx
      FROM q
    ), fit AS (
      SELECT n, sx, sy,
             (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) AS slope_raw
      FROM s
    )
    SELECT n AS n_terms,
           round(slope_raw, 6) AS zipf_slope,
           round((sy * 1.0 / n - slope_raw * (sx * 1.0 / n)) / 1000000, 6)
             AS zipf_intercept
    FROM fit
    """,
    tags=("text", "llm"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus term distribution: OLS of ln(freq)
    on ln(rank) (a healthy natural-language corpus slopes near -1; word
    soup or boilerplate-heavy corpora deviate — a cheap corpus-level
    quality signal next to the per-doc text_quality gates).

    log-rank/log-freq are quantized to integer micros per term, so the
    five OLS sums are exact integers and the closed-form slope/
    intercept is one deterministic division on each engine. Plan: one
    term groupBy, one vocabulary-sized ranking window, then a scalar
    aggregate — linear in tokens, and the regression itself costs
    O(vocab).
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    ranked = counts.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("term")))
        .cast("bigint")
        .alias("rnk"),
    )
    q = ranked.select(
        F.round(F.log("rnk") * F.lit(1000000)).cast("bigint").alias("xq"),
        F.round(F.log("c") * F.lit(1000000)).cast("bigint").alias("yq"),
    )
    s = q.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
    )
    fit = s.select(
        "n",
        "sx",
        "sy",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * F.lit(1.0)
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope_raw"),
    )
    return fit.select(
        F.col("n").alias("n_terms"),
        F.round("slope_raw", 6).alias("zipf_slope"),
        F.round(
            (
                F.col("sy") * F.lit(1.0) / F.col("n")
                - F.col("slope_raw") * (F.col("sx") * F.lit(1.0) / F.col("n"))
            )
            / F.lit(1000000),
            6,
        ).alias("zipf_intercept"),
    )
