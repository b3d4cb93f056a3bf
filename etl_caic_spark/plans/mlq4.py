"""Multinomial naive Bayes over the `documents` table: a trained
language classifier expressed as pure relational algebra (train =
grouped counts, classify = join + argmax), complementing the n-gram
heuristic `lang_id` (operators/text_analysis.predict_lang).

Float discipline: log-probabilities are quantized to BIGINT micros
per (class, term) BEFORE any cross-row summation, so document scores
are exact integer sums and the driver's value-hash match is bitwise
(registry.py conventions). Laplace-smoothed: P(t|c) =
(cnt+1)/(tot_c+V). Test-set terms absent from the training vocabulary
are dropped (standard multinomial NB ignore-OOV convention; documented
here so the oracle mirrors it via the same inner join on vocab).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "ml_nb_train",
    oracle="""
    WITH train AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 7 <> 0
    ), counts AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
      FROM train GROUP BY 1, 2
    ), tots AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS tot FROM train GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM train
    ), grid AS (
      SELECT t.lang, s.term, t.tot, v
      FROM tots t
      CROSS JOIN (SELECT DISTINCT term FROM train) s
      CROSS JOIN vocab
    )
    SELECT g.lang, g.term, coalesce(c.cnt, 0) AS cnt,
           CAST(round(ln((coalesce(c.cnt, 0) + 1.0) / (g.tot + v))
                      * 1000000) AS BIGINT) AS logp_micro
    FROM grid g
    LEFT JOIN counts c ON g.lang = c.lang AND g.term = c.term
    """,
    tags=("ml", "text"),
)
def ml_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train multinomial NB on the 6/7 training split: the model is the
    full (class x vocabulary) grid of Laplace-smoothed log-likelihoods
    in integer micros (zero-count cells included — classify needs them).

    Plan: one explode->groupBy for counts (partial-aggregated), class
    totals and vocabulary as broadcast-sized aggregates, grid built by
    broadcast cross join. Model size is classes x vocab — at 100 TB the
    corpus shrinks to that same bounded grid, the groupBys are the only
    shuffles, both linear in token count.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 != 0)
    train = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    counts = train.groupBy("lang", "term").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tots = train.groupBy("lang").agg(F.count("*").cast("bigint").alias("tot"))
    vocab = train.agg(F.count_distinct("term").cast("bigint").alias("v"))
    terms = train.select("term").distinct()
    grid = tots.crossJoin(F.broadcast(terms)).crossJoin(F.broadcast(vocab))
    joined = grid.join(counts, ["lang", "term"], "left").select(
        "lang",
        "term",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.round(
            F.log(
                (F.coalesce("cnt", F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            )
            * F.lit(1000000)
        )
        .cast("bigint")
        .alias("logp_micro"),
    )
    return joined


@register(
    "ml_nb_classify",
    oracle="""
    WITH train AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 7 <> 0
    ), counts AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
      FROM train GROUP BY 1, 2
    ), tots AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS tot FROM train GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM train
    ), model AS (
      SELECT g.lang, g.term,
             CAST(round(ln((coalesce(c.cnt, 0) + 1.0) / (g.tot + v))
                        * 1000000) AS BIGINT) AS logp_micro
      FROM (SELECT t.lang, s.term, t.tot, v
            FROM tots t
            CROSS JOIN (SELECT DISTINCT term FROM train) s
            CROSS JOIN vocab) g
      LEFT JOIN counts c ON g.lang = c.lang AND g.term = c.term
    ), priors AS (
      SELECT lang,
             CAST(round(ln(count(*) * 1.0 / (SELECT count(*) FROM documents
                                             WHERE doc_id % 7 <> 0))
                        * 1000000) AS BIGINT) AS prior_micro
      FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1
    ), test_tf AS (
      SELECT doc_id, lang AS true_lang, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id % 7 = 0)
      GROUP BY 1, 2, 3
    ), scored AS (
      SELECT doc_id, true_lang, m.lang,
             CAST(prior_micro + sum(tf * logp_micro) AS BIGINT) AS score_micro
      FROM test_tf t
      JOIN model m ON t.term = m.term
      JOIN priors p ON m.lang = p.lang
      GROUP BY 1, 2, 3, prior_micro
    )
    SELECT doc_id, true_lang, lang AS pred_lang, score_micro
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_micro DESC, lang ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    tags=("ml", "text"),
)
def ml_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify the held-out 1/7 split with the ml_nb_train model:
    score(doc, class) = prior + sum(tf * logp) in integer micros,
    prediction = argmax with deterministic lang-asc tie-break.

    Plan: test term frequencies (one groupBy) join the broadcast model
    grid (classes x vocab — bounded), then one groupBy to doc-class
    scores and a per-doc window argmax. OOV test terms drop at the
    inner join by design. Shuffles: the two groupBys plus the argmax
    window, all keyed on doc_id — AQE coalesces them; linear in test
    token count at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    train_docs = docs.filter(F.col("doc_id") % 7 != 0)
    train = train_docs.select("lang", F.explode(F.split("text", " ")).alias("term"))
    counts = train.groupBy("lang", "term").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tots = train.groupBy("lang").agg(F.count("*").cast("bigint").alias("tot"))
    vocab = train.agg(F.count_distinct("term").cast("bigint").alias("v"))
    terms = train.select("term").distinct()
    model = (
        tots.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(vocab))
        .join(counts, ["lang", "term"], "left")
        .select(
            "lang",
            "term",
            F.round(
                F.log(
                    (F.coalesce("cnt", F.lit(0)) + F.lit(1.0))
                    / (F.col("tot") + F.col("v"))
                )
                * F.lit(1000000)
            )
            .cast("bigint")
            .alias("logp_micro"),
        )
    )
    # Scalar n_train stays in the plan (broadcast cross join), not a
    # driver-side .count() — no extra full pass over the corpus.
    n_train = train_docs.agg(F.count("*").alias("n_train"))
    priors = (
        train_docs.groupBy("lang")
        .agg(F.count("*").alias("n_lang"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.round(
                F.log(F.col("n_lang") * F.lit(1.0) / F.col("n_train"))
                * F.lit(1000000)
            )
            .cast("bigint")
            .alias("prior_micro"),
        )
    )
    test_tf = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .groupBy("doc_id", "true_lang", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    scored = (
        test_tf.join(F.broadcast(model), "term")
        .join(F.broadcast(priors), "lang")
        .groupBy("doc_id", "true_lang", "lang", "prior_micro")
        .agg(
            (F.col("prior_micro") + F.sum(F.col("tf") * F.col("logp_micro")))
            .cast("bigint")
            .alias("score_micro")
        )
        .select("doc_id", "true_lang", "lang", "score_micro")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "true_lang", F.col("lang").alias("pred_lang"), "score_micro"
        )
    )


def _gram_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 16x16 integer Gram matrix: mirror the upper triangle of
    embed_gram_matrix (plans/mlq3.py) across the diagonal."""
    from etl_caic_spark.plans.mlq3 import embed_gram_matrix

    tri = embed_gram_matrix(spark, sf_dir)
    lower = tri.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "dot"
    )
    return tri.unionByName(lower)


_PCA_ORACLE_GRAM = """
    tri AS (
      SELECT CAST(gi.i AS INT) AS i, CAST(gj.j AS INT) AS j,
             CAST(sum(CAST(round(CAST(embedding[gi.i] AS DOUBLE) * 1000)
                           AS BIGINT)
                      * CAST(round(CAST(embedding[gj.j] AS DOUBLE) * 1000)
                             AS BIGINT)) AS BIGINT) AS dot
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, 16)) AS i) gi,
           LATERAL (SELECT unnest(generate_series(1, 16)) AS j) gj
      WHERE gj.j >= gi.i
      GROUP BY 1, 2
    ), g AS (
      SELECT i, j, dot FROM tri
      UNION ALL
      SELECT j AS i, i AS j, dot FROM tri WHERE i <> j
    )"""


def _matvec_sql(vprev: str, vnext: str) -> str:
    """One quantized power-iteration step as SQL CTEs: exact integer
    matvec, then renormalize to +-1e6 by the (exact) max abs entry."""
    return f"""
    {vnext}_w AS (
      SELECT g.i AS i, CAST(sum(g.dot * {vprev}.v) AS BIGINT) AS w
      FROM g JOIN {vprev} ON g.j = {vprev}.i GROUP BY 1
    ), {vnext} AS (
      SELECT i, CAST(round(w * 1.0 / (SELECT max(abs(w)) FROM {vnext}_w)
                           * 1000000) AS BIGINT) AS v
      FROM {vnext}_w
    )"""


@register(
    "embed_pca_power",
    oracle="WITH "
    + _PCA_ORACLE_GRAM
    + """, v0 AS (
      SELECT unnest(generate_series(1, 16)) AS i, CAST(1000000 AS BIGINT) AS v
    ),"""
    + _matvec_sql("v0", "v1")
    + ","
    + _matvec_sql("v1", "v2")
    + ","
    + _matvec_sql("v2", "v3")
    + """
    SELECT CAST(i AS INT) AS coord, v AS v_micro FROM v3
    """,
    tags=("ml", "linalg", "iterative"),
)
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix by THREE
    quantized power-iteration steps: v <- round(G v / max|G v| * 1e6),
    starting from the all-ones vector.

    Every matvec is an exact BIGINT sum (G entries are the integer
    milli-unit Gram of embed_gram_matrix; v stays in integer micros),
    and the one division per step is a deterministic scalar op — so an
    ITERATIVE eigensolver becomes a hash-exact relational query on both
    engines. Scale: the distributed work is only the Gram build
    (O(batches*d^2) shuffle, independent of row count); the iteration
    itself touches d^2=256 rows and would run on the driver at any
    scale — it's expressed relationally here to prove the semantics.
    """
    g = _gram_full(spark, sf_dir).localCheckpoint()
    v = spark.range(1, 17).select(
        F.col("id").cast("int").alias("i"), F.lit(1000000).cast("bigint").alias("v")
    )
    for _ in range(3):
        w = (
            g.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy(g["i"])
            .agg(F.sum(F.col("dot") * F.col("v")).cast("bigint").alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.crossJoin(F.broadcast(mx)).select(
            "i",
            F.round(F.col("w") * F.lit(1.0) / F.col("mx") * F.lit(1000000))
            .cast("bigint")
            .alias("v"),
        )
    return v.select(F.col("i").cast("int").alias("coord"), F.col("v").alias("v_micro"))


@register(
    "ml_future_purchase_label",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, ts, epoch(ts) AS sec
      FROM events
    ), labeled AS (
      SELECT event_id, user_id, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
             coalesce(max(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 1 FOLLOWING AND 86400 FOLLOWING),
               0) AS will_purchase_24h
      FROM e
    )
    SELECT event_id, user_id, event_type, ts,
           CAST(will_purchase_24h AS INT) AS will_purchase_24h
    FROM labeled WHERE event_id % 23 = 0
    """,
    tags=("ml", "timeseries"),
)
def ml_future_purchase_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-label generation with a FUTURE window: for every event,
    will this user purchase within the next 24 hours (exclusive of the
    current second)? The canonical churn/conversion labeling pass that
    turns an event log into supervised examples — and the classic
    LEAKAGE trap: the label window must start strictly AFTER the
    observation (RANGE 1 FOLLOWING), or the purchase event labels
    itself positive.

    The window ranges over epoch seconds (numeric RANGE frames are the
    portable form — Spark needs numeric bounds and DuckDB agrees on
    integer seconds). One shuffle on user_id; per-user streams sorted
    once, labels computed in a single forward pass at any scale.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(1, 86400)
    )
    return (
        e.withColumn(
            "will_purchase_24h",
            F.coalesce(
                F.max(
                    F.when(F.col("event_type") == "purchase", 1)
                ).over(w),
                F.lit(0),
            ).cast("int"),
        )
        .filter(F.col("event_id") % 23 == 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "will_purchase_24h",
        )
    )
