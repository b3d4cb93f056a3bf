"""LLM-data-pipeline queries, part 2 (north star): TF-IDF weighting,
document chunking, sequence packing, and train/test contamination checks
over the `documents` table — the pre-training-corpus preparation surface
beyond dedup/similarity (plans/llm.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import text_analysis as T
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "text_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id % 5 = 0)
      GROUP BY 1, 2
    ), n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id, term, tf,
           CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
           round(tf * ln(n_docs * 1.0
                         / (count(*) OVER (PARTITION BY term))), 6) AS tfidf
    FROM tf, n
    """,
    tags=("text", "llm"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) TF-IDF (operators/text_analysis.tfidf): raw counts
    stay integer-exact; tfidf = tf * ln(N/df) rounded 6 on both engines."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return T.tfidf(d, "doc_id", "text")


@register(
    "text_tfidf_capped",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id % 5 = 0)
      GROUP BY 1, 2
    ), n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 5 = 0),
    dfs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), kept AS (
      SELECT term, df FROM dfs, n WHERE df * 5 <= n_docs * 4
    )
    SELECT doc_id, tf.term AS term, tf, df,
           round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
    FROM tf JOIN kept ON tf.term = kept.term, n
    """,
    tags=("text", "llm"),
)
def text_tfidf_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with corpus-relative stop-term pruning (drop terms in more
    than 4/5 of documents — sklearn max_df=0.8 semantics, tested as exact
    integer cross-multiplication): stop terms never reach the join or the
    output (operators/text_analysis.tfidf(max_df_ratio=...), closing the
    documented term-skew gap)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return T.tfidf(d, "doc_id", "text", max_df_ratio=(4, 5))


@register(
    "text_chunks",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id % 5 = 0
    ), s AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words) - 10, 1), 30))
               AS start
      FROM w
    )
    SELECT doc_id,
           CAST((start - 1) // 30 AS INT) AS chunk_idx,
           CAST(len(words[start:start+39]) AS INT) AS chunk_tokens,
           array_to_string(words[start:start+39], ' ') AS chunk_text
    FROM s
    """,
    tags=("text", "llm"),
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 40-token chunks with stride 30
    (operators/text_analysis.chunk_documents)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return T.chunk_documents(d, "doc_id", "text", window=40, stride=30)


@register(
    "text_pack_sequences",
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM d
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum_before // 2048 AS BIGINT) AS bin,
           CAST(cum_before % 2048 AS BIGINT) AS offset_in_bin
    FROM c
    """,
    tags=("text", "llm"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of documents into 2048-token training
    bins, computed per shard so the running sum is a partitioned window
    (operators/text_analysis.pack_sequences)."""
    d = load_table(spark, sf_dir, "documents")
    return T.pack_sequences(d, "doc_id", "text", budget=2048, shards=8)


@register(
    "text_contamination",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang, source, text,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    ), sh0 AS (
      SELECT doc_id, split, shingle
      FROM (
        SELECT doc_id, split,
               unnest([array_to_string(words[i:i+2], ' ')
                       for i in generate_series(1, greatest(len(words)-2, 1))])
                 AS shingle
        FROM (SELECT doc_id, split, string_split(text, ' ') AS words
              FROM tagged)
      )
      GROUP BY ALL
    ), sh AS (
      SELECT doc_id, split, shingle
      FROM (SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM sh0)
      WHERE df <= 20
    )
    SELECT a.doc_id AS test_doc, b.doc_id AS train_doc,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.split = 'test' AND b.split = 'train'
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("text", "llm", "dedup"),
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination check: test-split documents sharing >= 2
    word-3-gram shingles with any train-split document, using the same
    md5-of-key split as train_test_split, with the stop-shingle df-cap
    (df <= 20 across both splits) that bounds the test×train join at df²
    per shingle (operators/text_analysis.contamination_pairs)."""
    d = load_table(spark, sf_dir, "documents")
    tag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    tagged = d.withColumn(
        "split", F.when(tag < "cccd", "train").otherwise("test")
    )
    return T.contamination_pairs(
        tagged, "doc_id", "text", "split", k=3, min_shared=2, max_shingle_df=20
    )


@register(
    "dedup_jaccard_capped",
    oracle="""
    WITH sh0 AS (
      SELECT doc_id, lang, source, shingle
      FROM (
        SELECT doc_id, lang, source,
               unnest([array_to_string(words[i:i+2], ' ')
                       for i in generate_series(1, greatest(len(words)-2, 1))])
                 AS shingle
        FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS words
              FROM documents)
      )
      GROUP BY ALL
    ),
    sh AS (
      SELECT doc_id, lang, source, shingle
      FROM (SELECT *, count(*) OVER (PARTITION BY lang, source, shingle)
                      AS df
            FROM sh0)
      WHERE df <= 20
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, common,
           CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
           common / (sa.n + sb.n - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common / (sa.n + sb.n - common) >= 0.2
    """,
    tags=("dedup", "llm"),
)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram Jaccard with the stop-shingle document-frequency cap (df <= 20)
    — the skew guard that bounds per-shingle candidate pairs at df² in any
    bucket (operators/dedup.ngram_jaccard_pairs(max_shingle_df=...));
    similarity is over informative shingles only."""
    from etl_caic_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", ["lang", "source"], k=3, threshold=0.2,
        max_shingle_df=20,
    )


@register(
    "embed_normalize",
    oracle="""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT vec_id, round(nrm, 6) AS norm,
           coalesce(array_to_string(
             list_transform(e, x -> CAST(round(
               (CASE WHEN nrm > 0 THEN round(x / nrm, 6) ELSE 0.0 END) * 1e6)
               AS BIGINT)), ','), '') AS unit_vec_micro
    FROM n
    """,
    tags=("similarity", "llm"),
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-L2 normalization of the embedding column
    (operators/embeddings.normalize_embeddings). The unit vector is emitted
    as comma-joined micro-units (component*1e6 rounded to BIGINT): integers
    stringify identically on both engines, where raw double→string repr
    would not, and the driver canonicalizer needs scalar cells."""
    from etl_caic_spark.operators.embeddings import normalize_embeddings

    nf = normalize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return nf.select(
        "vec_id",
        "norm",
        F.array_join(
            F.transform(
                "unit_vec",
                lambda x: F.round(x * 1e6, 0).cast("long").cast("string"),
            ),
            ",",
        ).alias("unit_vec_micro"),
    )


@register(
    "embed_quantize",
    oracle="""
    WITH m AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS maxabs
      FROM embeddings
    )
    SELECT vec_id,
           round(CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END, 6)
             AS scale,
           coalesce(array_to_string(
             list_transform(e, x -> CAST(round(
               x * (CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END))
               AS TINYINT)), ','), '') AS qvec
    FROM m
    """,
    tags=("similarity", "llm"),
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column
    (operators/embeddings.quantize_embeddings — true array<tinyint> output,
    the 4x storage reduction). Emitted comma-joined for the driver
    canonicalizer (tinyint→string is exact on both engines)."""
    from etl_caic_spark.operators.embeddings import quantize_embeddings

    qf = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return qf.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec"),
    )


@register(
    "vocab_topk",
    oracle="""
    SELECT term, CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
    FROM (
      SELECT term, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1
    )
    ORDER BY n DESC, term
    LIMIT 1000
    """,
    tags=("text", "llm"),
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1000 vocabulary by corpus frequency (tie-break on the term) —
    the tokenizer-training first step. Global top-k plans as
    TakeOrderedAndProject; the rank window runs on the 1000-row result,
    not the corpus."""
    from etl_caic_spark.util import widen_narrow_scan

    d = load_table(spark, sf_dir, "documents")
    counts = (
        widen_narrow_scan(d)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.col("n").desc(), "term").limit(1000)
    w = Window.orderBy(F.col("n").desc(), "term")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))
