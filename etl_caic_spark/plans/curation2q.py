"""Round-8 curation wave: the published-recipe corpus filters that were
still missing from the curation surface — each one a named step of a
public pretraining-data pipeline, re-expressed Spark-first and fully
oracled.

- dedup_paragraph_cdc: content-defined-chunking paragraph dedup with
  document RECONSTRUCTION (the Dolma/CCNet paragraph-dedup step; CDC
  boundaries are the LBFS/rsync trick that keeps chunk identity stable
  under insertions, which fixed-width segmentation cannot).
- data_mixture_temperature: temperature-scaled source sampling
  (the multilingual "sample with p_s ∝ n_s^τ" schedule).
- text_perplexity_buckets: CCNet's head/middle/tail split by LM
  perplexity tertile — here a corpus unigram LM with frozen micro-nat
  surprisals and the windowless distributed selection operator for the
  tertile thresholds.
- quality_gopher_rules: the Gopher rule gate with PER-RULE attribution
  aggregated by source (which rule kills how many docs where), one step
  past text_quality_filter's single composite score.

Reference parity note: the reference (task.ts:88-189) has no corpus
surface at all — this family is part of the mandated 100-TB
training-data extension, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_FOOTER = (
    "terms of service apply all rights reserved contact support for details"
)


@register(
    "dedup_paragraph_cdc",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' {_FOOTER}'
                  ELSE text END AS text
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             CASE WHEN doc_id % 7 = 0 THEN text || ' {_FOOTER}'
                  ELSE text END
      FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
    pos AS (
      SELECT doc_id, i, l[i] AS w,
             CASE WHEN CAST(('0x' || substr(md5(l[i]), 1, 8)) AS BIGINT)
                       % 8 = 7 THEN 1 ELSE 0 END AS b
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
    ),
    cid AS (
      SELECT doc_id, i, w,
             CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
      FROM pos
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             string_agg(w, ' ' ORDER BY i) AS chunk
      FROM cid GROUP BY 1, 2
    ),
    first AS (
      SELECT chunk, min(doc_id * 10000 + chunk_id) AS keep_ord
      FROM chunks GROUP BY 1
    ),
    kept AS (
      SELECT c.doc_id, c.chunk_id, c.chunk
      FROM chunks c JOIN first f
        ON f.chunk = c.chunk
       AND c.doc_id * 10000 + c.chunk_id = f.keep_ord
    ),
    reb AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY chunk_id) AS text_kept
      FROM kept GROUP BY 1
    ),
    pd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      FROM chunks GROUP BY 1
    )
    SELECT pd.doc_id, pd.n_chunks,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           md5(coalesce(reb.text_kept, '')) AS kept_md5
    FROM pd LEFT JOIN reb USING (doc_id)
    """,
    tags=("dedup", "llm", "text", "scale"),
)
def dedup_paragraph_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level corpus dedup with document reconstruction — the
    Dolma-recipe step that removes REPEATED paragraphs everywhere but
    their first occurrence and reassembles each document from its
    surviving paragraphs. Paragraph boundaries are CONTENT-DEFINED
    (a token ends a chunk when md5(token) % 8 == 7 — the LBFS/rsync
    rolling-boundary idea, expected chunk length 8 tokens): identical
    passages chunk identically regardless of their offset in the
    document, so an appended boilerplate footer or a full document copy
    dedups even though fixed-width segmentation would mis-align it.
    The fixture corpus injects both (exact copies of doc_id % 10 == 0
    under shifted ids, and a shared footer on doc_id % 7 == 0) so both
    removal modes are exercised: copies collapse to n_kept = 0, footers
    survive only on the lowest-ordinal carrier.

    Plan shape: tokenize → per-doc PARTITIONED prefix-sum window for
    chunk ids (no global window anywhere) → chunk assembly by
    (doc_id, chunk_id) → first-occurrence argmin groupBy on the chunk
    text → hash-join back → per-doc ordered reassembly. Chunk streams
    are corpus-sized (non-overlapping), so every stage is one shuffle
    of ~|tokens| rows; at 100 TB the chunk-text groupBy key becomes
    md5(chunk) (128-bit) to shrink the shuffle, same shape."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with_footer = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" " + _FOOTER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    copies = with_footer.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = with_footer.unionByName(copies)
    toks = corpus.select("doc_id", F.split("text", " ").alias("l"))
    pos = toks.select(
        "doc_id", F.posexplode("l").alias("i0", "w")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "w",
        F.when(
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint") % 8
            == 7,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cid = pos.select(
        "doc_id",
        "i",
        "w",
        F.coalesce(F.sum("b").over(win), F.lit(0)).cast("bigint").alias("chunk_id"),
    )
    # Materialize the chunk stream once: three consumers (first-occurrence
    # argmin, the kept join, and the per-doc chunk count) would otherwise
    # re-run tokenize→window→assembly three times. The chunk stream is
    # corpus-sized/8 — the same bounded-intermediate class as the curation
    # pipeline's c1 checkpoint; on a cluster this is a persisted stage.
    chunks = cid.groupBy("doc_id", "chunk_id").agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(i, w))), x -> x.w)"),
        ).alias("chunk")
    ).localCheckpoint()
    # First-occurrence keep WITHOUT a join-back: min over the
    # (doc_id, chunk_id) STRUCT is the lexicographic argmin, so one
    # groupBy on the chunk text yields the surviving
    # (doc_id, chunk_id, chunk) rows directly — no second pass over the
    # chunk stream, no string-keyed join, and no packed-ordinal overflow
    # bound (a doc_id*K + chunk_id encoding would silently mis-attribute
    # chunks past chunk_id >= K; the struct min has no such ceiling).
    kept = (
        chunks.groupBy("chunk")
        .agg(F.min(F.struct("doc_id", "chunk_id")).alias("keep"))
        .select(
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.chunk_id").alias("chunk_id"),
            "chunk",
        )
    )
    reb = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(chunk_id, chunk))),"
                " x -> x.chunk)"
            ),
        ).alias("text_kept"),
    )
    pd = chunks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_chunks"))
    return pd.join(reb, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        F.md5(F.coalesce(F.col("text_kept"), F.lit(""))).alias("kept_md5"),
    )


@register(
    "data_mixture_temperature",
    oracle="""
    WITH n AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_natural
      FROM documents GROUP BY 1, 2
    ),
    f AS (
      SELECT source, lang, n_natural,
             CAST(round(pow(n_natural, 0.7) * 1000) AS BIGINT) AS w_milli
      FROM n
    ),
    s AS (SELECT CAST(sum(w_milli) AS BIGINT) AS tw,
                 CAST(sum(n_natural) AS BIGINT) AS tn
          FROM f)
    SELECT source, lang, n_natural, w_milli,
           CAST((w_milli * 1000000) // tw AS BIGINT) AS weight_ppm,
           CAST(((w_milli * 1000000) // tw * tn) // 1000000 AS BIGINT)
             AS n_target,
           CAST((((w_milli * 1000000) // tw * tn) // 1000000) * 1000
                // n_natural AS BIGINT) AS epochs_milli
    FROM f CROSS JOIN s
    """,
    tags=("sampling", "llm"),
)
def data_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture schedule — the multilingual-sampling
    rule p_s ∝ n_s^τ (τ = 0.7) that upweights small (source, lang)
    slices relative to their natural share. One float op per GROUP
    (pow, frozen immediately to integer milli-weights); every
    downstream step — ppm share, target doc count, epochs over the
    natural data — is exact integer arithmetic, so the schedule
    hash-matches across engines with no summation-order exposure.
    Complements data_mixture_sampler (balanced min-count draw): that
    one SELECTS documents, this one produces the weighting schedule a
    sampler consumes (epochs_milli > 1000 marks slices that repeat).
    Plan: one groupBy at slice grain + a broadcast scalar total — the
    data-scale pass is the count; everything after is 97 rows."""
    n = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_natural"))
    )
    f = n.select(
        "source",
        "lang",
        "n_natural",
        F.round(F.pow(F.col("n_natural").cast("double"), F.lit(0.7)) * 1000)
        .cast("bigint")
        .alias("w_milli"),
    )
    s = f.agg(
        F.sum("w_milli").cast("bigint").alias("tw"),
        F.sum("n_natural").cast("bigint").alias("tn"),
    )
    return f.crossJoin(F.broadcast(s)).select(
        "source",
        "lang",
        "n_natural",
        "w_milli",
        F.expr("(w_milli * 1000000) div tw").cast("bigint").alias("weight_ppm"),
        F.expr("((w_milli * 1000000) div tw * tn) div 1000000")
        .cast("bigint")
        .alias("n_target"),
        F.expr(
            "(((w_milli * 1000000) div tw * tn) div 1000000) * 1000"
            " div n_natural"
        )
        .cast("bigint")
        .alias("epochs_milli"),
    )


@register(
    "text_perplexity_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    w AS (
      SELECT doc_id, l[i] AS w
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
    ),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM w GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM w),
    sup AS (
      SELECT w, CAST(round(round(-ln(cu * 1.0 / t), 6) * 1e6) AS BIGINT)
               AS s_micro
      FROM uni CROSS JOIN tot
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(s_micro) // count(*) AS BIGINT) AS surprisal_micro
      FROM w JOIN sup USING (w)
      GROUP BY 1
    ),
    q AS (
      SELECT surprisal_micro,
             row_number() OVER (ORDER BY surprisal_micro, doc_id) AS rn
      FROM per
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM per),
    t AS (
      SELECT max(CASE WHEN rn = (c + 2) // 3 THEN surprisal_micro END) AS t1,
             max(CASE WHEN rn = (2 * c + 2) // 3 THEN surprisal_micro END)
               AS t2
      FROM q CROSS JOIN nn
    )
    SELECT doc_id, n_toks, surprisal_micro,
           CASE WHEN surprisal_micro <= t1 THEN 'head'
                WHEN surprisal_micro <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM per CROSS JOIN t
    """,
    tags=("text", "llm", "scale"),
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split: score every document by
    mean token surprisal under a corpus-level unigram LM, then cut the
    corpus at the surprisal tertiles — 'head' is the fluent third that
    trains first, 'tail' the third one inspects before keeping. Token
    surprisals -ln(c/T) are frozen to micro-nat BIGINTs before the
    per-doc mean (integer div — sums are positive so truncation ==
    floor on both engines), so scores are exact integers.

    The tertile thresholds use operators/selection.kth_smallest
    (histogram bisection: bounded <= 4096-row collects, NO global sort,
    NO window) with lower-tertile ranks k = ceil(n/3) and ceil(2n/3) —
    the same windowless selection shape ts_theil_sen uses, which is
    what survives a 100-TB score table; the oracle's row_number mirror
    pins the identical rank semantics. The LM table broadcasts onto
    the token stream (vocab << corpus)."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    w = toks.select("doc_id", F.explode("l").alias("w"))
    # One token-grain scan builds the LM: the corpus total is the sum of
    # the vocab counts, so no second pass for T.
    uni = w.groupBy("w").agg(F.count("*").cast("bigint").alias("cu")).localCheckpoint()
    tot = uni.agg(F.sum("cu").cast("bigint").alias("t"))
    sup = uni.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.round(F.round(-F.log(F.col("cu") / F.col("t")), 6) * 1e6)
            .cast("bigint")
            .alias("s_micro")
        ),
    )
    per = (
        w.join(F.broadcast(sup), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            F.expr("sum(s_micro) div count(*)")
            .cast("bigint")
            .alias("surprisal_micro"),
        )
    ).localCheckpoint()
    # multi-k bisection (round 11): both tertile ranks narrow from the
    # same histogram scan per round and n rides the bounds job.
    n, (t1, t2) = kth_smallest_multi(
        per, "surprisal_micro", lambda n: [(n + 2) // 3, (2 * n + 2) // 3]
    )
    return per.select(
        "doc_id",
        "n_toks",
        "surprisal_micro",
        F.when(F.col("surprisal_micro") <= t1, "head")
        .when(F.col("surprisal_micro") <= t2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


_STOPS = ["a", "the", "of", "to", "and"]


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
    ),
    hof AS (
      SELECT doc_id, source,
             CAST(len(l) AS BIGINT) AS n,
             CAST(list_sum(list_transform(l, w -> length(w))) AS BIGINT)
               AS sc,
             CAST(len(list_distinct(list_filter(l,
                  w -> list_contains({_STOPS!r}, w)))) AS BIGINT) AS nstop,
             CAST(len(l) - 1 AS BIGINT) AS nb,
             CAST(len(list_distinct(list_transform(
                  generate_series(1, len(l) - 1),
                  i -> l[i] || ' ' || l[i + 1]))) AS BIGINT) AS nbd
      FROM toks
    ),
    topw AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS mx
      FROM (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(l) AS w FROM toks)
        GROUP BY 1, 2
      ) GROUP BY 1
    ),
    rules AS (
      SELECT source,
             CASE WHEN h.n BETWEEN 35 AND 95 THEN 0 ELSE 1 END AS f_wc,
             CASE WHEN h.sc * 5 BETWEEN 16 * h.n AND 23 * h.n
                  THEN 0 ELSE 1 END AS f_mwl,
             CASE WHEN h.nstop >= 2 THEN 0 ELSE 1 END AS f_stop,
             CASE WHEN t.mx * 10 <= h.n THEN 0 ELSE 1 END AS f_top,
             CASE WHEN (h.nb - h.nbd) * 20 <= h.nb THEN 0 ELSE 1 END
               AS f_dup2
      FROM hof h JOIN topw t USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_wc) AS BIGINT) AS n_fail_wordcount,
           CAST(sum(f_mwl) AS BIGINT) AS n_fail_meanwordlen,
           CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
           CAST(sum(f_top) AS BIGINT) AS n_fail_topword,
           CAST(sum(f_dup2) AS BIGINT) AS n_fail_dupbigram,
           CAST(sum(CASE WHEN f_wc + f_mwl + f_stop + f_top + f_dup2 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM rules GROUP BY 1
    """,
    tags=("text", "llm"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule gate with per-rule attribution by
    source: word-count window [35, 95], mean word length in [3.2, 4.6],
    >= 2 distinct stopwords, top-word fraction <= 0.10, duplicate
    (overlapping) bigram fraction <= 0.05 — the published rule-based
    filter family, with thresholds adapted to this corpus's token
    distribution so every rule has a live pass AND fail population.
    Each ratio threshold is evaluated by integer CROSS-MULTIPLICATION
    (sc*5 vs 16n..23n, mx*10 vs n, (nb-nbd)*20 vs nb), so no float ever
    exists and the gate is bit-exact on both engines. The per-source
    rollup answers the curation question a single pass/fail cannot:
    WHICH rule is destroying WHICH source.

    Plan: one pass of per-doc higher-order-function signals (size /
    aggregate / array_distinct — zero shuffle), plus the one signal
    HOFs cannot express linearly (top-word count) as an explode +
    two-level groupBy, then a 20-row rollup. At 100 TB the explode is
    the only token-grain shuffle; everything else is map-side."""
    d = load_table(spark, sf_dir, "documents")
    rules = gopher_doc_flags(d).drop("doc_id")
    return rules.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("f_wc").cast("bigint").alias("n_fail_wordcount"),
        F.sum("f_mwl").cast("bigint").alias("n_fail_meanwordlen"),
        F.sum("f_stop").cast("bigint").alias("n_fail_stopwords"),
        F.sum("f_top").cast("bigint").alias("n_fail_topword"),
        F.sum("f_dup2").cast("bigint").alias("n_fail_dupbigram"),
        F.sum(
            F.when(
                F.col("f_wc")
                + F.col("f_mwl")
                + F.col("f_stop")
                + F.col("f_top")
                + F.col("f_dup2")
                == 0,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass"),
    )


def gopher_doc_flags(d: DataFrame) -> DataFrame:
    """Per-document Gopher rule flags (doc_id, source, f_wc, f_mwl,
    f_stop, f_top, f_dup2; 0 = pass) over any (doc_id, source, text)
    frame — the shared rule pipeline of quality_gopher_rules (source
    rollup) and quality_ensemble_gate (wave21a.py, per-doc gate), so
    the two can never drift apart (the r12 minhash-sharing precedent).
    """
    toks = d.select("doc_id", "source", F.split("text", " ").alias("l"))
    stops = ",".join(f"'{s}'" for s in _STOPS)
    hof = toks.select(
        "doc_id",
        "source",
        F.size("l").cast("bigint").alias("n"),
        F.expr("aggregate(l, 0L, (acc, w) -> acc + length(w))")
        .cast("bigint")
        .alias("sc"),
        F.expr(
            f"size(array_distinct(filter(l, w -> w IN ({stops}))))"
        )
        .cast("bigint")
        .alias("nstop"),
        (F.size("l") - 1).cast("bigint").alias("nb"),
        F.expr(
            "size(array_distinct(transform(sequence(1, size(l) - 1),"
            " i -> concat(l[i - 1], ' ', l[i]))))"
        )
        .cast("bigint")
        .alias("nbd"),
    )
    topw = (
        toks.select("doc_id", F.explode("l").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("mx"))
    )
    return hof.join(topw, "doc_id").select(
        "doc_id",
        "source",
        F.when(F.col("n").between(35, 95), 0).otherwise(1).alias("f_wc"),
        F.when(
            (F.col("sc") * 5 >= 16 * F.col("n"))
            & (F.col("sc") * 5 <= 23 * F.col("n")),
            0,
        )
        .otherwise(1)
        .alias("f_mwl"),
        F.when(F.col("nstop") >= 2, 0).otherwise(1).alias("f_stop"),
        F.when(F.col("mx") * 10 <= F.col("n"), 0).otherwise(1).alias("f_top"),
        F.when((F.col("nb") - F.col("nbd")) * 20 <= F.col("nb"), 0)
        .otherwise(1)
        .alias("f_dup2"),
    )
