"""Round-9 wave B: a trained multinomial naive-Bayes language
classifier over the document corpus, and proper-scoring-rule model
evaluation (Brier score + log-loss).

- ``ml_naive_bayes``: the registry's lang_id (llm.py) is a rule-based
  heuristic; this is the TRAINED counterpart — the fastText-style
  count-based classifier an LLM curation pipeline fits on labeled data
  and then applies at corpus scale (quality/language filtering). Train
  and apply run in one plan: per-(lang, word) Laplace-smoothed token
  counts are the model; each document's per-language score is the
  BIGINT-exact micro-nat sum  iln(prior) + sum_w tf_w * iln(cnt+1)
  - n_tokens * iln(tokens_lang + V)  (every ln is of an integer —
  operators/micronat.py discipline), and the argmax per document folds
  to a confusion matrix. The self-classification accuracy on the
  training corpus is the standard model-audit readout.
- ``eval_brier_logloss``: Brier score and log-loss for the same
  deterministic milli-probability predictions eval_calibration_bins
  scores (prob_milli = (vec_id*37) %% 1000, clamped to [1, 999] so
  ln(0) is unreachable; y = label %% 2). Squared errors stay integer
  ((p_milli - 1000y)^2 is already the micro-scaled square) and each
  log-loss term is a difference of two integer micro-nat logs, so both
  sums are BIGINT-exact and each published metric is one rounded
  division.

Reference parity: the reference (task.ts:88-189) has no ML surface —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# ml_naive_bayes
# --------------------------------------------------------------------------

_ILN = "CAST(round(round(ln({x}), 6) * 1e6) AS BIGINT)"

_NB_SQL = f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tokcnt AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2, 3
    ),
    ntok AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      FROM toks GROUP BY 1
    ),
    cnt AS (
      SELECT lang AS cl, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    toktot AS (SELECT cl, CAST(sum(c) AS BIGINT) AS tt FROM cnt GROUP BY 1),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM toks),
    nd AS (
      SELECT lang AS cl, CAST(count(*) AS BIGINT) AS ndl
      FROM documents GROUP BY 1
    ),
    ndt AS (SELECT CAST(count(*) AS BIGINT) AS ndt FROM documents),
    langs AS (SELECT DISTINCT lang AS cl FROM documents),
    s1 AS (
      SELECT t.doc_id, t.lang, l.cl,
             CAST(sum(t.tf * coalesce({_ILN.format(x="c.c + 1")}, 0))
                  AS BIGINT) AS s1
      FROM tokcnt t CROSS JOIN langs l
      LEFT JOIN cnt c ON c.cl = l.cl AND c.w = t.w
      GROUP BY 1, 2, 3
    ),
    sc AS (
      SELECT s1.doc_id, s1.lang, s1.cl,
             s1.s1
             + {_ILN.format(x="nd.ndl")}
             - {_ILN.format(x="ndt.ndt")}
             - ntok.n_tokens * {_ILN.format(x="toktot.tt + vocab.v")}
               AS score
      FROM s1
      JOIN ntok USING (doc_id)
      JOIN nd ON nd.cl = s1.cl
      JOIN toktot ON toktot.cl = s1.cl
      CROSS JOIN ndt CROSS JOIN vocab
    ),
    win AS (
      SELECT doc_id, lang, cl AS pred_lang
      FROM sc
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cl) = 1
    )
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM win GROUP BY 1, 2
"""


@register("ml_naive_bayes", oracle=_NB_SQL, tags=("ml", "llm", "text"))
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained on the labeled corpus and applied
    back to it, reported as a (true lang, predicted lang, count)
    confusion matrix. Scores are exact BIGINT micro-nats: Laplace
    add-one keeps every ln argument an integer >= 1 (a word unseen for
    a language contributes iln(1) = 0 plus the shared smoothing-mass
    term n_tokens * iln(tokens_lang + V)), so Spark and DuckDB agree
    digit-for-digit; argmax ties break by language ascending.

    Plan shape: ONE tokenize shuffle builds both the model (lang x word
    counts — vocab-sized, broadcast back) and the compressed per-doc
    term vectors; scoring fans each distinct (doc, word) out by the
    language dim (|langs| = 5 — a broadcast crossJoin, linear fan-out)
    and reduces per (doc, lang); the argmax is a doc-partitioned top-1
    window (WindowGroupLimit — no global sort), and the confusion
    matrix is a final |langs|^2-row groupBy. At 100 TB the model stays
    vocab-sized however large the corpus (hash the vocab to fixed
    buckets if it does not — the DSIR posture), and every corpus-sized
    shuffle is keyed by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    tokcnt = toks.groupBy("doc_id", "lang", "w").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    ntok = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_tokens"))
    cnt = toks.groupBy(F.col("lang").alias("cl"), "w").agg(
        F.count("*").cast("bigint").alias("c")
    )
    toktot = cnt.groupBy("cl").agg(F.sum("c").cast("bigint").alias("tt"))
    vocab = toks.agg(F.countDistinct("w").cast("bigint").alias("v"))
    nd = d.groupBy(F.col("lang").alias("cl")).agg(
        F.count("*").cast("bigint").alias("ndl")
    )
    ndt = d.agg(F.count("*").cast("bigint").alias("ndt"))
    langs = d.select(F.col("lang").alias("cl")).distinct()
    s1 = (
        tokcnt.crossJoin(F.broadcast(langs))
        .join(F.broadcast(cnt), ["cl", "w"], "left")
        .groupBy("doc_id", "lang", "cl")
        .agg(
            F.sum(F.col("tf") * F.coalesce(iln(F.col("c") + 1), F.lit(0)))
            .cast("bigint")
            .alias("s1")
        )
    )
    sc = (
        s1.join(ntok, "doc_id")
        .join(F.broadcast(nd), "cl")
        .join(F.broadcast(toktot), "cl")
        .crossJoin(F.broadcast(ndt))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            "cl",
            (
                F.col("s1")
                + iln(F.col("ndl"))
                - iln(F.col("ndt"))
                - F.col("n_tokens") * iln(F.col("tt") + F.col("v"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cl"))
    win = sc.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return win.groupBy("lang", F.col("cl").alias("pred_lang")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# --------------------------------------------------------------------------
# eval_brier_logloss
# --------------------------------------------------------------------------

_BRIER_SQL = f"""
    WITH scored AS (
      SELECT greatest(1, least(999, CAST((vec_id * 37) % 1000 AS BIGINT)))
               AS p_milli,
             CAST(label % 2 AS BIGINT) AS y
      FROM embeddings
    ),
    terms AS (
      SELECT p_milli, y,
             (p_milli - 1000 * y) * (p_milli - 1000 * y) AS sqerr,
             CASE WHEN y = 1
                  THEN {_ILN.format(x="p_milli")} - {_ILN.format(x="1000")}
                  ELSE {_ILN.format(x="1000 - p_milli")}
                       - {_ILN.format(x="1000")}
             END AS ll_micro
      FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(sqerr) AS BIGINT) AS sum_sqerr,
           CAST(sum(ll_micro) AS BIGINT) AS sum_ll_micro,
           CAST(round(sum(sqerr) * 1.0 / count(*)) AS BIGINT) AS brier_micro,
           CAST(round(-sum(ll_micro) * 1.0 / count(*)) AS BIGINT)
             AS logloss_micro
    FROM terms
"""


@register("eval_brier_logloss", oracle=_BRIER_SQL, tags=("ml", "eval", "agg"))
def eval_brier_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score and log-loss (proper scoring rules) for the
    deterministic milli-probability model shared with
    eval_calibration_bins (mlq.py:242), probabilities clamped to
    [0.001, 0.999] so ln never sees 0. The squared error
    (p_milli - 1000y)^2 IS the micro-scaled square — integer, no
    rounding until the final mean; each log-loss term is a difference
    of two integer micro-nat logs (operators/micronat.py). Both sums
    are one map-side-combinable aggregate over a pure projection —
    single-row output at any input size."""
    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.greatest(
            F.lit(1), F.least(F.lit(999), ((F.col("vec_id") * 37) % 1000))
        )
        .cast("bigint")
        .alias("p_milli"),
        (F.col("label") % 2).cast("bigint").alias("y"),
    )
    terms = scored.select(
        "p_milli",
        "y",
        ((F.col("p_milli") - 1000 * F.col("y")) * (F.col("p_milli") - 1000 * F.col("y"))).alias(
            "sqerr"
        ),
        F.when(F.col("y") == 1, iln(F.col("p_milli")) - iln(F.lit(1000)))
        .otherwise(iln(F.lit(1000) - F.col("p_milli")) - iln(F.lit(1000)))
        .alias("ll_micro"),
    )
    return terms.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("sqerr").cast("bigint").alias("sum_sqerr"),
        F.sum("ll_micro").cast("bigint").alias("sum_ll_micro"),
        F.round(F.sum("sqerr") * 1.0 / F.count("*")).cast("bigint").alias("brier_micro"),
        F.round(-F.sum("ll_micro") * 1.0 / F.count("*"))
        .cast("bigint")
        .alias("logloss_micro"),
    )