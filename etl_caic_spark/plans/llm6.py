"""Wave 22 (round 5): corpus-diversity and tokenizer-QA signals — word
entropy (per-doc distribution diversity), out-of-vocabulary rate against
a frozen top-K vocabulary, and a deterministic k-reservoir sample. These
are the remaining per-document quality gates a curation pipeline runs
between dedup and packing: entropy kills degenerate/templated docs that
pass length checks, OOV rate audits tokenizer fit, and the hash
reservoir gives an eyeball-able uniform sample of any table.

Exactness: integer word counts; logs follow the registry's micro-nat
convention (round(ln(c), 6)·1e6 as BIGINT per DISTINCT count value, so
the per-doc sum is exact-integer and both engines round the same scalar
the same way); divisions are single and rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "text_word_entropy",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
           FROM words GROUP BY 1, 2),
    per AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * CAST(round(round(ln(c), 6) * 1e6) AS BIGINT))
                  AS BIGINT) AS sum_clnc_micro
      FROM wc GROUP BY 1
    )
    SELECT doc_id, n_words, n_types,
           round(round(ln(n_words), 6)
                 - sum_clnc_micro / 1e6 / n_words, 6) AS entropy_nats,
           round(n_types * 1.0 / n_words, 6) AS type_token_ratio
    FROM per
    """,
    tags=("text", "llm", "quality"),
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-distribution (Shannon) entropy in nats plus
    type-token ratio — the diversity gate that catches templated or
    keyboard-mash documents that pass length and stopword filters.
    Uses the identity H = ln n − (Σ c·ln c)/n so only ln of INTEGER
    counts is ever taken: each ln(c) is rounded to micro-nats once per
    distinct count value (the registry's micro-nat convention, same
    scalar rounding on both engines), making the per-doc accumulation
    BIGINT-exact and summation-order-proof.

    Scale: explode → two map-side-combinable group-bys keyed by
    (doc_id, word) then doc_id — shuffles carry the tokenized corpus
    once; no corpus-wide state, so it parallelizes embarrassingly at
    100 TB. Cited shape: quality gates family (SURVEY §2.C; reference
    has no text surface — this is the LLM-extension mandate)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("c"))
    lnc_micro = (
        F.round(F.round(F.log(F.col("c")), 6) * 1e6).cast("bigint")
    )
    per = wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("c") * lnc_micro).cast("bigint").alias("sum_clnc_micro"),
    )
    return per.select(
        "doc_id",
        "n_words",
        "n_types",
        F.round(
            F.round(F.log(F.col("n_words")), 6)
            - F.col("sum_clnc_micro") / 1e6 / F.col("n_words"),
            6,
        ).alias("entropy_nats"),
        F.round(F.col("n_types") * 1.0 / F.col("n_words"), 6).alias(
            "type_token_ratio"
        ),
    )


@register(
    "text_vocab_coverage",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM words GROUP BY 1),
    vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY cf DESC, w) AS rk FROM cf
      ) WHERE rk <= 500
    ),
    per AS (
      SELECT words.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM words LEFT JOIN vocab v ON words.w = v.w
      GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_oov,
           round(n_oov * 1.0 / n_tokens, 6) AS oov_ratio
    FROM per
    """,
    tags=("text", "llm", "quality"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate against a FROZEN top-500 corpus vocabulary
    (ties broken deterministically by frequency desc, word asc) — the
    tokenizer-fit audit: a rising OOV ratio on new data means the vocab
    (or tokenizer merges) no longer matches the corpus. Two passes: a
    corpus-frequency aggregate ranks the vocab, then tokens LEFT-join
    the vocab dimension and unmatched occurrences count as OOV.

    Scale: the rank window runs over DISTINCT words (vocab-cardinality
    input, not corpus-size — single partition but bounded), and the
    500-row vocab broadcasts to the token join, so the only
    corpus-sized shuffle is the word-frequency group-by. At 100 TB
    this is exactly the production vocab-audit shape."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    cf = words.groupBy("w").agg(F.count("*").cast("bigint").alias("cf"))
    vocab = (
        cf.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("cf"), F.asc("w"))),
        )
        .where(F.col("rk") <= 500)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    per = (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round(F.col("n_oov") * 1.0 / F.col("n_tokens"), 6).alias("oov_ratio"),
    )


@register(
    "sample_reservoir_k",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
    LIMIT 100
    """,
    tags=("sampling",),
)
def sample_reservoir_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size uniform sample (the distributed stand-in
    for reservoir sampling): keep the k=100 rows with the SMALLEST
    md5-of-key — since the hash is uniform on keys, the k smallest form
    an exact uniform k-subset, and unlike a stateful reservoir it is
    reproducible, mergeable across partitions (each partition offers
    its local top-k, TakeOrdered merges), and identical on any engine
    with md5. The md5 hex string is the sort key; event_id breaks the
    (impossible-in-practice) tie.

    Scale: Spark plans orderBy+limit as TakeOrderedAndProject — per
    partition O(n log k) with only k rows moving to the driver-side
    merge; no full sort, no full shuffle. This is the canonical
    'eyeball 100 rows of a 100 TB table, reproducibly' operator."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type")
        .orderBy(F.md5(F.col("event_id").cast("string")), F.col("event_id"))
        .limit(100)
    )
