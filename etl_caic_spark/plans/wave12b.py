"""Round-9 wave K (file wave12b): corpus ROUGE-1/ROUGE-2 — the
recall-oriented member of the MT/summarization metric trio.

eval_bleu_corpus (precision + brevity penalty, wave8c.py) and
eval_chrf_corpus (char-gram F, wave8d.py) cover the precision and
character sides; ``eval_rouge_corpus`` adds the RECALL side that
summarization evaluation actually reports (Lin 2004, ROUGE-N): clipped
n-gram matches over REFERENCE totals, with precision and F1 carried
alongside. Same corpus convention as BLEU — even doc_id is the
reference, odd the hypothesis, paired by doc_id div 2.

Exactness: clipped counts are exact BIGINT sums (least of per-pair
hypothesis/reference n-gram counts — one equi-join per order, no
windows); precision and recall are one rounded division each into
micro-units, and F1 is computed FROM those two integers
(round(2*p*r/(p+r))) with the identical text on both engines, so no
float ever crosses an engine boundary unrounded. Zero-denominator
guards return 0 (an empty-overlap corpus scores 0, per the metric's
convention).

Scale: two tokenize scans (unigrams, bigrams) -> per-(pair, gram)
partial-agg counts -> one hash join per order keyed on (pair_id, gram)
-> single-row reduce. Everything is linear in token count; nothing is
ever sorted.

Reference parity: the reference (task.ts:88-189) has no eval surface —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_ROUGE_SQL = """
    WITH pairs AS (
      SELECT doc_id // 2 AS pair_id,
             doc_id % 2 AS side,
             string_split(text, ' ') AS ws
      FROM documents
    ),
    uni AS (
      SELECT pair_id, side, w AS g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT pair_id, side, unnest(ws) AS w FROM pairs)
      GROUP BY 1, 2, 3
    ),
    bi AS (
      SELECT pair_id, side, g, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT pair_id, side, ws[i] || ' ' || ws[i + 1] AS g
        FROM (SELECT pair_id, side, ws,
                     unnest(generate_series(1, len(ws) - 1)) AS i
              FROM pairs WHERE len(ws) >= 2)
      ) GROUP BY 1, 2, 3
    ),
    clip1 AS (
      SELECT CAST(sum(least(h.c, coalesce(r.c, 0))) AS BIGINT) AS clipped,
             CAST(sum(h.c) AS BIGINT) AS tot_hyp
      FROM (SELECT * FROM uni WHERE side = 1) h
      LEFT JOIN (SELECT * FROM uni WHERE side = 0) r
        ON r.pair_id = h.pair_id AND r.g = h.g
    ),
    ref1 AS (
      SELECT CAST(sum(c) AS BIGINT) AS tot_ref FROM uni WHERE side = 0
    ),
    clip2 AS (
      SELECT CAST(sum(least(h.c, coalesce(r.c, 0))) AS BIGINT) AS clipped,
             CAST(sum(h.c) AS BIGINT) AS tot_hyp
      FROM (SELECT * FROM bi WHERE side = 1) h
      LEFT JOIN (SELECT * FROM bi WHERE side = 0) r
        ON r.pair_id = h.pair_id AND r.g = h.g
    ),
    ref2 AS (
      SELECT CAST(sum(c) AS BIGINT) AS tot_ref FROM bi WHERE side = 0
    ),
    m AS (
      SELECT c1.clipped AS clip1, c1.tot_hyp AS hyp1, r1.tot_ref AS ref1,
             c2.clipped AS clip2, c2.tot_hyp AS hyp2, r2.tot_ref AS ref2,
             CAST(round(c1.clipped * 1000000.0 / c1.tot_hyp) AS BIGINT) AS p1,
             CAST(round(c1.clipped * 1000000.0 / r1.tot_ref) AS BIGINT) AS r1m,
             CAST(round(c2.clipped * 1000000.0 / c2.tot_hyp) AS BIGINT) AS p2,
             CAST(round(c2.clipped * 1000000.0 / r2.tot_ref) AS BIGINT) AS r2m
      FROM clip1 c1, ref1 r1, clip2 c2, ref2 r2
    )
    SELECT clip1, hyp1, ref1,
           p1 AS rouge1_p_micro, r1m AS rouge1_r_micro,
           CASE WHEN p1 + r1m = 0 THEN 0
                ELSE CAST(round(2.0 * p1 * r1m / (p1 + r1m)) AS BIGINT)
           END AS rouge1_f1_micro,
           clip2, hyp2, ref2,
           p2 AS rouge2_p_micro, r2m AS rouge2_r_micro,
           CASE WHEN p2 + r2m = 0 THEN 0
                ELSE CAST(round(2.0 * p2 * r2m / (p2 + r2m)) AS BIGINT)
           END AS rouge2_f1_micro
    FROM m
"""


@register("eval_rouge_corpus", oracle=_ROUGE_SQL, tags=("eval", "llm", "text"))
def eval_rouge_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ROUGE-1/ROUGE-2 precision, recall and F1 in micro-units
    over the even=reference / odd=hypothesis document pairing shared
    with eval_bleu_corpus (module docstring for the exactness and scale
    argument)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        F.expr("doc_id div 2").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.split("text", " ").alias("ws"),
    )

    def grams(n: int) -> DataFrame:
        if n == 1:
            g = pairs.select(
                "pair_id", "side", F.explode("ws").alias("g")
            )
        else:
            g = (
                pairs.filter(F.size("ws") >= 2)
                .select(
                    "pair_id",
                    "side",
                    F.posexplode(F.expr("slice(ws, 1, size(ws) - 1)")).alias(
                        "i0", "w"
                    ),
                    "ws",
                )
                .select(
                    "pair_id",
                    "side",
                    F.concat_ws(
                        " ", F.col("w"), F.expr("ws[i0 + 1]")
                    ).alias("g"),
                )
            )
        return g.groupBy("pair_id", "side", "g").agg(
            F.count("*").cast("bigint").alias("c")
        )

    def fold(gdf: DataFrame) -> DataFrame:
        h = gdf.filter(F.col("side") == 1)
        r = gdf.filter(F.col("side") == 0)
        clip = (
            h.join(
                r.select("pair_id", "g", F.col("c").alias("rc")),
                ["pair_id", "g"],
                "left",
            )
            .agg(
                F.sum(F.least(F.col("c"), F.coalesce(F.col("rc"), F.lit(0))))
                .cast("bigint")
                .alias("clipped"),
                F.sum("c").cast("bigint").alias("tot_hyp"),
            )
        )
        ref = r.agg(F.sum("c").cast("bigint").alias("tot_ref"))
        return clip.crossJoin(ref)

    f1_ = fold(grams(1)).select(
        F.col("clipped").alias("clip1"),
        F.col("tot_hyp").alias("hyp1"),
        F.col("tot_ref").alias("ref1"),
    )
    f2_ = fold(grams(2)).select(
        F.col("clipped").alias("clip2"),
        F.col("tot_hyp").alias("hyp2"),
        F.col("tot_ref").alias("ref2"),
    )

    def micro(num: Column, den: Column) -> Column:
        return F.round(num * 1000000.0 / den).cast("bigint")

    m = f1_.crossJoin(f2_).select(
        "*",
        micro(F.col("clip1"), F.col("hyp1")).alias("p1"),
        micro(F.col("clip1"), F.col("ref1")).alias("r1m"),
        micro(F.col("clip2"), F.col("hyp2")).alias("p2"),
        micro(F.col("clip2"), F.col("ref2")).alias("r2m"),
    )

    def f1_of(p: str, r: str) -> Column:
        return (
            F.when(F.col(p) + F.col(r) == 0, F.lit(0))
            .otherwise(
                F.round(2.0 * F.col(p) * F.col(r) / (F.col(p) + F.col(r)))
            )
            .cast("bigint")
        )

    return m.select(
        "clip1",
        "hyp1",
        "ref1",
        F.col("p1").alias("rouge1_p_micro"),
        F.col("r1m").alias("rouge1_r_micro"),
        f1_of("p1", "r1m").alias("rouge1_f1_micro"),
        "clip2",
        "hyp2",
        "ref2",
        F.col("p2").alias("rouge2_p_micro"),
        F.col("r2m").alias("rouge2_r_micro"),
        f1_of("p2", "r2m").alias("rouge2_f1_micro"),
    )
