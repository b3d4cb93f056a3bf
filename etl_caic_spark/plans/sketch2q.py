"""Wave 15 (round 5): mergeable-sketch SET OPERATIONS, span-level corpus
dedup, and deterministic weighted sampling — three more training-data /
warehouse patterns, all fully oracled.

The KMV set-operation query is the payoff of portable md5 sketches
(sketch_kmv_distinct): union/Jaccard/intersection ESTIMATES across
segment pairs are themselves deterministic, so the approximate answers
hash-match DuckDB — sketch algebra with a correctness proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_K = 64
_HASH_SPACE = 1152921504606846976.0  # 2^60


@register(
    "sketch_kmv_setops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS seg,
                      md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    iv AS (
      SELECT seg,
             list_sum(list_transform(generate_series(1, 15), i ->
               CAST(strpos('0123456789abcdef', hx[i]) - 1 AS BIGINT)
               * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS v
      FROM h
    ),
    sk AS (
      SELECT seg, v FROM (
        SELECT seg, v, row_number() OVER (PARTITION BY seg ORDER BY v) AS rn
        FROM iv
      ) WHERE rn <= {_K}
    ),
    segs AS (SELECT DISTINCT seg FROM sk),
    pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b
      FROM segs a JOIN segs b ON a.seg < b.seg
    ),
    uv AS (
      SELECT seg_a, seg_b, s.v
      FROM pairs JOIN sk s ON s.seg = seg_a OR s.seg = seg_b
      GROUP BY 1, 2, 3
    ),
    ur AS (
      SELECT seg_a, seg_b, v,
             row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY v) AS rn
      FROM uv
    ),
    tau AS (
      SELECT seg_a, seg_b, v AS tau FROM ur WHERE rn = {_K}
    ),
    nb AS (
      SELECT ur.seg_a, ur.seg_b, count(*) AS n_both
      FROM ur
      JOIN sk x ON x.seg = ur.seg_a AND x.v = ur.v
      JOIN sk y ON y.seg = ur.seg_b AND y.v = ur.v
      WHERE ur.rn <= {_K}
      GROUP BY 1, 2
    )
    SELECT tau.seg_a, tau.seg_b,
           round({_K - 1}.0 * {_HASH_SPACE} / tau, 2) AS union_est,
           round(coalesce(n_both, 0) / {_K}.0, 4) AS jaccard_est,
           round((coalesce(n_both, 0) / {_K}.0)
                 * ({_K - 1}.0 * {_HASH_SPACE} / tau), 2) AS intersect_est
    FROM tau LEFT JOIN nb USING (seg_a, seg_b)
    """,
    tags=("sketch", "agg", "setops"),
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS across segment pairs — the warehouse
    question 'how many distinct users do segments A and B share?'
    answered from k=64 mergeable sketches instead of a re-scan: union =
    KMV of the merged minima ((k−1)/F(k) on the union's kth minimum);
    Jaccard = fraction of the union's k minima present in BOTH input
    sketches; intersection = Jaccard × union (inclusion by estimate).
    Because the md5 hash is portable, every ESTIMATE is deterministic
    and hash-matches the oracle — the set-algebra extension of
    sketch_kmv_distinct, and the property that makes sketches usable as
    a segment-overlap matrix at 100 TB: sketches reduce map-side to ≤k
    values per segment, the pair matrix is O(|segments|²·k) — driver
    cheap — and the raw data is scanned once, ever."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.col("event_type").alias("seg"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    ).distinct()
    iv = h.select(
        "seg", F.conv(F.substring("hx", 1, 15), 16, 10).cast("bigint").alias("v")
    )
    w = Window.partitionBy("seg").orderBy("v")
    sk = iv.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _K
    ).select("seg", "v")
    segs = sk.select("seg").distinct()
    pairs = (
        segs.select(F.col("seg").alias("seg_a"))
        .join(segs.select(F.col("seg").alias("seg_b")))
        .filter(F.col("seg_a") < F.col("seg_b"))
    )
    uv = (
        pairs.join(
            sk, (sk["seg"] == F.col("seg_a")) | (sk["seg"] == F.col("seg_b"))
        )
        .select("seg_a", "seg_b", "v")
        .distinct()
    )
    wu = Window.partitionBy("seg_a", "seg_b").orderBy("v")
    ur = uv.withColumn("rn", F.row_number().over(wu))
    tau = ur.filter(F.col("rn") == _K).select(
        "seg_a", "seg_b", F.col("v").alias("tau")
    )
    ska = sk.select(F.col("seg").alias("_sa"), F.col("v").alias("_va"))
    skb = sk.select(F.col("seg").alias("_sb"), F.col("v").alias("_vb"))
    nb = (
        ur.filter(F.col("rn") <= _K)
        .join(ska, (F.col("_sa") == F.col("seg_a")) & (F.col("_va") == F.col("v")))
        .join(skb, (F.col("_sb") == F.col("seg_b")) & (F.col("_vb") == F.col("v")))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").alias("n_both"))
    )
    union_est = F.lit(float(_K - 1)) * F.lit(_HASH_SPACE) / F.col("tau")
    jac = F.coalesce(F.col("n_both"), F.lit(0)) / F.lit(float(_K))
    return (
        tau.join(nb, ["seg_a", "seg_b"], "left")
        .select(
            "seg_a",
            "seg_b",
            F.round(union_est, 2).alias("union_est"),
            F.round(jac, 4).alias("jaccard_est"),
            F.round(jac * union_est, 2).alias("intersect_est"),
        )
    )


@register(
    "text_span_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    spans AS (
      SELECT doc_id, j,
             l[2 * j + 1] || ' ' || l[2 * j + 2] AS span
      FROM toks,
           LATERAL (SELECT unnest(generate_series(0, len(l) // 2 - 1)) AS j) g
    ),
    freq AS (SELECT span, CAST(count(*) AS BIGINT) AS cf
             FROM spans GROUP BY 1),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN cf >= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans
      FROM spans JOIN freq USING (span)
      GROUP BY 1
    )
    SELECT doc_id, n_spans, n_dup_spans,
           round(n_dup_spans * 1.0 / n_spans, 4) AS dup_ratio
    FROM per
    """,
    tags=("text", "dedup", "llm"),
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level corpus dedup signal (the C4/Gopher repeated-span
    filter, distinct from text_boilerplate_ngrams' overlapping-ngram
    document-frequency ratio): each document is cut into NON-overlapping
    2-token spans, span frequency is counted corpus-wide, and each doc
    reports how much of it consists of spans repeated ≥5 times across
    the corpus — the signal used to strip boilerplate spans before
    training. Non-overlapping spans mean the span stream is the same
    size as the corpus (not ×n like shingles), so the frequency count
    is one shuffle over ~|tokens|/2 rows and the join back is on the
    span key both sides already shuffle on. At 100 TB: hash the span to
    64 bits before the groupBy to shrink the shuffle, same shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(l) DIV 2 - 1),"
                " j -> concat(l[2 * j], ' ', l[2 * j + 1]))"
            )
        ).alias("span"),
    )
    freq = spans.groupBy("span").agg(F.count("*").alias("cf"))
    per = (
        spans.join(freq, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("cf") >= 5, 1).otherwise(0)).alias("n_dup_spans"),
        )
    )
    return per.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.round(F.col("n_dup_spans") / F.col("n_spans"), 4).alias("dup_ratio"),
    )


@register(
    "sample_weighted_topk",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             (list_sum(list_transform(generate_series(1, 15), i ->
                CAST(strpos('0123456789abcdef',
                            md5(CAST(doc_id AS VARCHAR))[i]) - 1 AS BIGINT)
                * (CAST(1 AS BIGINT) << (4 * (15 - i))))) + 1)
               / 1152921504606846977.0 AS uni
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_chars,
             round(pow(uni, 1.0 / n_chars), 12) AS k
      FROM u
    )
    SELECT doc_id, n_chars, k,
           CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INT) AS rnk
    FROM keyed
    QUALIFY rnk <= 50
    """,
    tags=("sampling", "llm"),
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each document draws u ∈ (0,1) from a
    PORTABLE md5 hash of its id (no engine RNG — the same md5-band trick
    that oracled sample_fraction) and is ranked by u^(1/w) with
    w = n_chars; the top-50 keys ARE a weighted sample without
    replacement — longer documents proportionally more likely, which is
    the standard size-weighted curation draw. The key is frozen to 12
    decimals before ranking (pow's last-ulp may differ across engines;
    same freeze-then-compare precedent as the trig/ln oracles) with a
    doc_id tiebreak, making the sample fully reproducible — the property
    a training run needs for data lineage.

    Scale: orderBy+limit compiles to TakeOrderedAndProject — per
    partition O(n log k), only 50 rows reach the driver-side merge (the
    sample_reservoir_k pattern, llm6.py). The rnk column is then a
    row_number over the 50 surviving rows — a bounded single-partition
    window, not a global one over the fact table."""
    d = load_table(spark, sf_dir, "documents")
    uni = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
         .cast("bigint") + 1)
        / F.lit(1152921504606846977.0)
    )
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.round(F.pow(uni, 1.0 / F.col("n_chars")), 12).alias("k"),
    )
    top = keyed.orderBy(F.desc("k"), F.asc("doc_id")).limit(50)
    wk = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return top.withColumn("rnk", F.row_number().over(wk).cast("int"))
