"""LLM-data-pipeline queries, part 3: deterministic LSH-cosine ANN,
repetition-based quality signals, and URL canonicalization dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import dedup as D
from etl_caic_spark.operators import lsh as L
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "sim_lsh_cosine",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    twins AS (
      SELECT vec_id + 100000 AS tid,
             list_transform(generate_series(1, 64), i ->
               CASE WHEN i - 1 = vec_id % 64 THEN -e[i] ELSE e[i] END) AS te
      FROM src WHERE vec_id % 10 = 0
    ),
    corpus AS (
      SELECT vec_id, e FROM src
      UNION ALL
      SELECT tid AS vec_id, te AS e FROM twins
    ),
    q AS (
      SELECT vec_id, e,
             list_transform(e, x -> CAST(floor(x * 1e6) AS BIGINT)) AS qv
      FROM corpus
    ),
    bits AS (
      SELECT vec_id, p,
             CASE WHEN list_sum(list_transform(generate_series(0, 63), d ->
               (CASE WHEN (1103515245 * (p*64 + d + 1) + 12345)
                          % 2147483648 % 2048 >= 1024
                     THEN 1 ELSE -1 END) * qv[d+1])) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM q, generate_series(0, 63) AS t(p)
    ),
    bv AS (
      SELECT vec_id, p // 16 AS band,
             CAST(sum(bit * (1 << (p % 16))) AS BIGINT) AS band_val
      FROM bits GROUP BY 1, 2
      QUALIFY count(*) OVER (PARTITION BY p // 16,
                             CAST(sum(bit * (1 << (p % 16))) AS BIGINT)) <= 512
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bv a JOIN bv b
        ON a.band = b.band AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           round(list_inner_product(qa.e, qb.e)
                 / (sqrt(list_inner_product(qa.e, qa.e))
                    * sqrt(list_inner_product(qb.e, qb.e))), 6) AS cosine
    FROM cand
    JOIN q qa ON qa.vec_id = id_a
    JOIN q qb ON qb.vec_id = id_b
    WHERE round(list_inner_product(qa.e, qb.e)
                / (sqrt(list_inner_product(qa.e, qa.e))
                   * sqrt(list_inner_product(qb.e, qb.e))), 6) >= 0.9
    """,
    tags=("similarity", "llm", "ann"),
)
def sim_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidate pairs verified by exact cosine
    (operators/lsh.py — Charikar STOC'02 sign-random-projection). The
    whole path is integer-deterministic (LCG hyperplanes + floor-quantized
    vectors), so unlike the xxhash-based MinHash/IVF paths the oracle
    reproduces bucket assignment EXACTLY — a hash-matched ANN query.

    Round 5: the registered config IS the scale config — the operator
    defaults (64 planes, 16-bit bands, near-dup threshold 0.9), the exact
    setup the 1×/10×/30× scale probe measures linear. The old 16-plane /
    4-bit-band config (random-collision rate 0.5^4 per band → measured
    quadratic candidate growth) is demoted to a pytest-only anchor
    (tests/test_round2_ops.py::test_lsh_pairs_subset_of_brute_force),
    where its collision-richness is the point.

    The synthetic embeddings are near-orthogonal random vectors (max pair
    cosine ≈ 0.51 at sf0.01), so a 0.9-threshold query over the raw corpus
    would be vacuously empty. The query therefore plants deterministic
    near-dup twins — every 10th vector re-enters with ONE dimension
    sign-flipped (id + 100000; cosine = 1 − 2·v_d²/‖v‖² ≈ 0.97, exact in
    IEEE arithmetic on both engines) — so the banding + verify path is
    exercised at its design threshold and the oracle hash-checks a
    non-trivial result."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = twinned_embedding_corpus(e)
    return L.lsh_cosine_pairs(
        corpus, "vec_id", "embedding", threshold=0.9, planes=64, band_bits=16, dims=64
    )


def twinned_embedding_corpus(e: DataFrame) -> DataFrame:
    """The embeddings corpus with planted near-dup twins — THE shared
    fixture for the semantic near-dup queries (sim_lsh_cosine here,
    dedup_semantic_embedding in wave11b.py): every 10th vector re-enters
    under id + 100000 with ONE dimension sign-flipped (cosine ~ 0.97,
    exact in IEEE arithmetic on both engines). Any change here must be
    mirrored in each consumer's oracle (the `twins` CTE)."""
    flip = F.col("vec_id") % 64
    # Flip BEFORE re-idding: a `vec_id + 100000 AS vec_id` alias in the same
    # select would capture the lambda's vec_id reference via lateral column
    # alias resolution and flip the wrong dimension.
    twins = (
        e.where(F.col("vec_id") % 10 == 0)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == flip, -x).otherwise(x),
            ).alias("embedding"),
        )
        .withColumn("vec_id", F.col("vec_id") + 100000)
    )
    return e.select("vec_id", "embedding").unionByName(twins)


@register(
    "text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    wc AS (
      SELECT doc_id, word, count(*) AS c
      FROM (SELECT doc_id, unnest(words) AS word FROM w)
      GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS top_word_n
      FROM wc GROUP BY 1
    ),
    bc AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
      FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (
          SELECT doc_id,
                 unnest([array_to_string(words[i:i+1], ' ')
                         for i in generate_series(1, len(words)-1)]) AS g
          FROM w WHERE len(words) >= 2
        )
        GROUP BY 1, 2
      )
      GROUP BY 1
    )
    SELECT p.doc_id, n_words, n_distinct,
           round(n_distinct / n_words, 6) AS uniq_ratio,
           top_word_n,
           round(top_word_n / n_words, 6) AS top_word_frac,
           coalesce(top_bigram_n, 0) AS top_bigram_n,
           round(coalesce(top_bigram_n, 0)
                 / greatest(n_words - 1, 1), 6) AS top_bigram_frac
    FROM per_doc p LEFT JOIN bc USING (doc_id)
    """,
    tags=("text", "llm", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text_analysis.
    repetition_signals): top-word fraction, top-bigram fraction, and
    distinct-word ratio per document — the repetition-based quality
    filters a pre-training corpus applies alongside text_quality."""
    from etl_caic_spark.operators import text_analysis as T

    d = load_table(spark, sf_dir, "documents")
    return T.repetition_signals(d, "doc_id", "text")


@register(
    "url_dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://' || upper(source) || '.Example.COM:443/Docs/'
               || CAST(doc_id % 1000 AS VARCHAR)
               || '/?utm_source=feed&ref=' || lang
               || '&id=' || CAST(doc_id % 200 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
             regexp_replace(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
               '/+$', '') AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM raw
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://'
             || CASE WHEN scheme = 'https'
                     THEN regexp_replace(hostport, ':443$', '')
                     WHEN scheme = 'http'
                     THEN regexp_replace(hostport, ':80$', '')
                     ELSE hostport END
             || path
             || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
      FROM (
        SELECT *, array_to_string(list_sort(list_filter(
                 string_split(query, '&'),
                 p -> p <> '' AND NOT starts_with(p, 'utm_')
                      AND NOT starts_with(p, 'ref='))), '&') AS qs
        FROM parts
      )
    )
    SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc
    FROM canon GROUP BY 1
    """,
    tags=("dedup", "llm", "url"),
)
def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (operators/urls.canonicalize_url): a
    deterministic synthetic raw URL per document (mixed case, default
    port, tracking params, fragment) is canonicalized and grouped — the
    crawl-layer dedup that runs before any content hashing. Pure
    regexp/HOF expressions, no UDF; one shuffle on the canonical key."""
    from etl_caic_spark.operators.urls import canonicalize_url

    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.upper("source"),
            F.lit(".Example.COM:443/Docs/"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit("/?utm_source=feed&ref="),
            F.col("lang"),
            F.lit("&id="),
            (F.col("doc_id") % 200).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return (
        raw.select("doc_id", canonicalize_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").cast("bigint").alias("n_docs"), F.min("doc_id").alias("min_doc"))
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
    cf AS (SELECT w, count(*) AS cf FROM words GROUP BY 1),
    n AS (SELECT CAST(sum(cf) AS BIGINT) AS n FROM cf),
    lp AS (
      SELECT w, CAST(round(round(ln(cf / n), 6) * 1e6) AS BIGINT) AS lp_micro
      FROM cf, n
    ),
    scored AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(sum(c * lp_micro) AS BIGINT) AS sum_micro
      FROM wc JOIN lp USING (w)
      GROUP BY 1
    )
    SELECT doc_id, n_words,
           sum_micro / 1e6 AS logprob,
           round(sum_micro / 1e6 / n_words, 6) AS avg_logprob
    FROM scored
    """,
    tags=("text", "llm", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability per document (operators/text_analysis.
    unigram_logprob) — the perplexity-proxy quality signal. Per-term
    ln(cf/N) is integerized to micro-nats so the per-doc reduction is an
    exact BIGINT sum on both engines (summation-order-free)."""
    from etl_caic_spark.operators import text_analysis as T

    d = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob(d, "doc_id", "text")


@register(
    "dedup_keep_best",
    oracle="""
    WITH raw AS (
      SELECT doc_id, n_chars,
             'HTTPS://' || upper(source) || '.Example.COM:443/Docs/'
               || CAST(doc_id % 1000 AS VARCHAR)
               || '/?utm_source=feed&ref=' || lang
               || '&id=' || CAST(doc_id % 200 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, n_chars,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
             regexp_replace(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
               '/+$', '') AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM raw
    ),
    canon AS (
      SELECT doc_id, n_chars,
             scheme || '://'
             || CASE WHEN scheme = 'https'
                     THEN regexp_replace(hostport, ':443$', '')
                     WHEN scheme = 'http'
                     THEN regexp_replace(hostport, ':80$', '')
                     ELSE hostport END
             || path
             || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
      FROM (
        SELECT *, array_to_string(list_sort(list_filter(
                 string_split(query, '&'),
                 p -> p <> '' AND NOT starts_with(p, 'utm_')
                      AND NOT starts_with(p, 'ref='))), '&') AS qs
        FROM parts
      )
    ),
    ranked AS (
      SELECT canonical_url, doc_id, n_chars,
             row_number() OVER (PARTITION BY canonical_url
                                ORDER BY n_chars DESC, doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
               AS n_dups
      FROM canon
    )
    SELECT canonical_url, doc_id AS kept_doc, n_chars AS kept_chars, n_dups
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "llm", "curation"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each canonical-URL dup group
    keep the BEST document (longest text, doc_id as the deterministic
    tiebreak) and record the group size — the "which copy survives"
    decision that follows every dedup pass in corpus curation. One
    shuffle on the canonical key; the row_number + count windows share
    the same partitioning, so they run in one window stage. At 100 TB
    the quality key can be any scalar score (the registered text_quality
    signals compose here) without changing the shape."""
    from etl_caic_spark.operators.urls import canonicalize_url
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("HTTPS://"),
            F.upper("source"),
            F.lit(".Example.COM:443/Docs/"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit("/?utm_source=feed&ref="),
            F.col("lang"),
            F.lit("&id="),
            (F.col("doc_id") % 200).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    canon = raw.select(
        "doc_id", "n_chars", canonicalize_url(F.col("url")).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    ranked = canon.select(
        "canonical_url",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.col("n_chars").desc(), F.col("doc_id")))
        .alias("rn"),
        F.count("*").over(w).alias("n_dups"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "canonical_url",
        F.col("doc_id").alias("kept_doc"),
        F.col("n_chars").alias("kept_chars"),
        "n_dups",
    )


@register(
    "dedup_minhash_md5",
    oracle="""
    WITH w AS (
      SELECT doc_id AS doc, string_split(text, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc, unnest(list_distinct(list_transform(
               generate_series(0, greatest(len(words) - 3, 0)),
               i -> array_to_string(list_slice(words, i + 1, i + 3), ' ')
             ))) AS shingle
      FROM w
    ),
    mins AS (
      SELECT doc, j, min(md5(CAST(j AS VARCHAR) || '|' || shingle)) AS h
      FROM sh, generate_series(0, 15) t(j)
      GROUP BY doc, j
    ),
    sig AS (
      SELECT doc, list(h ORDER BY j) AS sig FROM mins GROUP BY doc
    ),
    banded AS (
      SELECT doc, b AS band_idx,
             md5(array_to_string(list_slice(sig, b*2 + 1, b*2 + 2), ','))
               AS band_hash
      FROM sig, generate_series(0, 7) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc < b.doc
    )
    SELECT doc_a, doc_b,
           list_sum(list_transform(generate_series(1, 16),
             i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16
             AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc = doc_a
    JOIN sig sb ON sb.doc = doc_b
    WHERE list_sum(list_transform(generate_series(1, 16),
            i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16
          >= 0.5
    """,
    tags=("dedup", "llm", "minhash"),
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with engine-portable md5 hashing
    (operators/dedup.minhash_lsh_pairs_md5): min-of-md5 signatures in
    lexicographic hex order, 8 bands × 2 rows, candidates verified by
    signature agreement — the FULLY ORACLED MinHash (round 5). The
    xxhash64 fast path (`dedup_minhash`) keeps its rows-only check +
    recall pytest; this twin proves the banding/candidate semantics
    hash-exactly against DuckDB running the identical construction."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_md5(
        d, "doc_id", "text", num_hashes=16, bands=8, k=3, threshold=0.5
    )
