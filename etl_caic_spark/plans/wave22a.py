"""Round-15 wave 22a: third frontier wave of the round — the removal /
diversification / preference-aggregation layer, each with an exact
DuckDB oracle:

- ``text_exactsubstr_removal``: the ExactSubstr recipe's REMOVAL step
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better") — dedup_gram50_exact detects duplicated spans; this op cuts
  them out. Every positional token 8-gram that occurs >= 2 times in
  the corpus (cross-doc or within-doc) marks its token interval for
  removal; overlapping intervals merge (gaps-and-islands), and the
  cleaned document is reconstructed from the surviving tokens.
- ``data_d4_prototype_prune``: D4's diversification stage (Tirumala et
  al. 2023) — after SemDeDup prunes within-cluster near-duplicates,
  D4 ALSO prunes the most cluster-PROTOTYPICAL points (closest to
  their centroid: the low-information redundant core of each cluster).
  Reuses the trained exact-centroid quantizer of sim_topk_ivf_exact /
  dedup_semdedup_prune; prunes the top decile by cosine-to-centroid
  per cluster.
- ``eval_bt_strength``: Bradley-Terry strength of data SOURCES under
  the frozen linear reward model — the Chatbot-Arena-style pairwise
  aggregation: every cross-source document pair is a virtual
  head-to-head judged by the frozen reward score (ties = half win).
  Win totals are computed WITHOUT pair enumeration via the
  score-histogram cross product at a bounded grid grain, then two
  minorization-maximization iterations run in exact fixed-point
  integer arithmetic — bit-identical across engines.

Reference parity: none of this exists in the reference (task.ts has no
text/embedding surface) — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators import similarity as S
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import widen_narrow_scan

# --------------------------------------------------------------------------
# text_exactsubstr_removal
# --------------------------------------------------------------------------

_XR_G = 8  # removal gram width in tokens

_XR_SQL = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    g AS (
      SELECT doc_id, u.pos AS pos, u.gh AS gh
      FROM (
        SELECT doc_id, unnest(list_transform(
                 generate_series(0, greatest(len(l) - {_XR_G}, 0)),
                 i -> {{'pos': i, 'gh': md5(array_to_string(
                          list_slice(l, i + 1, i + {_XR_G}), ' '))}})) AS u
        FROM w
      )
    ),
    cf AS (SELECT gh, count(*) AS cnt FROM g GROUP BY 1),
    dup AS (
      SELECT doc_id, pos FROM g JOIN cf USING (gh) WHERE cnt >= 2
    ),
    lagged AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM dup
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos > prev + {_XR_G}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM lagged
    ),
    iv AS (
      SELECT doc_id, min(pos) AS a, max(pos) + {_XR_G} - 1 AS b
      FROM isl GROUP BY doc_id, island
    ),
    ivl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             list({{'a': a, 'b': b}} ORDER BY a) AS ivs
      FROM iv GROUP BY 1
    ),
    rec AS (
      SELECT w.doc_id, len(w.l) AS n,
             coalesce(ivl.n_spans, 0) AS n_spans,
             list_filter(generate_series(0, len(w.l) - 1),
                         p -> coalesce(len(list_filter(ivl.ivs,
                                s -> p >= s.a AND p <= s.b)), 0) = 0) AS kept,
             w.l AS l
      FROM w LEFT JOIN ivl USING (doc_id)
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n - len(kept) AS BIGINT) AS n_removed,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST((2 * (n - len(kept)) * 1000000 + n)
                // (2 * n) AS BIGINT) AS removed_micro,
           coalesce(array_to_string(list_transform(kept, p -> l[p + 1]), ' '),
                    '') AS clean_text
    FROM rec
"""


@register(
    "text_exactsubstr_removal",
    oracle=_XR_SQL,
    tags=("text", "dedup", "llm", "curation"),
)
def text_exactsubstr_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicate-span REMOVAL (Lee et al. 2022): every
    positional {_XR_G}-token gram whose verbatim text occurs >= 2 times
    anywhere in the corpus (cross-document or repeated within one
    document) marks the token interval [pos, pos+{_XR_G}-1] for
    removal; overlapping-or-abutting intervals merge into islands
    (two duplicated grams at starts p < q merge iff q <= p + {_XR_G}),
    and each document is re-emitted with the surviving tokens joined
    back into `clean_text` plus exact removal accounting (token count,
    removed count, merged-span count, removed fraction in
    round-half-up micro). Documents with no duplicated gram pass
    through byte-identical. Detection-side sibling:
    dedup_gram50_exact (wave19a.py) reports the duplication signal at
    50-gram grain; this op is the pipeline's destructive step at the
    boilerplate-sized grain.

    Plan shape: positional grams are md5-keyed BEFORE the shuffle
    (32-byte digests move, not {_XR_G}-word strings); corpus frequency
    is ONE window over the gram partitioning (the dedup_gram50_exact
    idiom — a gram repeated d times costs d rows, never d²); islands
    are a lag + running-sum window over the DOC partitioning
    (duplicated positions only — a tiny fraction of the corpus);
    reconstruction joins the per-doc merged-interval array back at doc
    grain and filters tokens with a per-row higher-order exists — no
    token-level join, no explode on the rebuild side. At 100 TB: three
    linear shuffles (gram df, island agg, doc-grain rebuild join);
    per-row rebuild cost is n_tokens × n_islands with islands bounded
    by n_tokens/{_XR_G}."""
    d = load_table(spark, sf_dir, "documents")
    toks = widen_narrow_scan(d).select(
        "doc_id", F.split("text", " ").alias("l")
    )
    n = F.size("l")
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n - _XR_G, F.lit(0))),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("l"), i + 1, _XR_G))),
            )
        ).alias("pos", "gh"),
    )
    cfw = Window.partitionBy("gh")
    dup = grams.withColumn("cnt", F.count("*").over(cfw)).where(
        F.col("cnt") >= 2
    )
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    lagged = dup.select(
        "doc_id", "pos", F.lag("pos").over(wlag).alias("prev")
    )
    isl = lagged.select(
        "doc_id",
        "pos",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + _XR_G),
                1,
            ).otherwise(0)
        )
        .over(wlag.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    iv = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("a"), (F.max("pos") + _XR_G - 1).alias("b")
    )
    ivl = iv.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.array_sort(F.collect_list(F.struct("a", "b"))).alias("ivs"),
    )
    rec = toks.join(ivl, "doc_id", "left")
    covered = lambda p: F.coalesce(  # noqa: E731
        F.exists(
            F.col("ivs"), lambda s: (p >= s.getField("a")) & (p <= s.getField("b"))
        ),
        F.lit(False),
    )
    kept = F.filter(F.sequence(F.lit(0), n - 1), lambda p: ~covered(p))
    return rec.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        (n - F.size(kept)).cast("bigint").alias("n_removed"),
        F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
        F.expr(
            f"(2 * (size(l) - size(filter(sequence(0, size(l) - 1),"
            f" p -> NOT coalesce(exists(ivs, s -> p >= s.a AND p <= s.b),"
            f" false)))) * 1000000 + size(l)) div (2 * size(l))"
        )
        .cast("bigint")
        .alias("removed_micro"),
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at(F.col("l"), p + 1))
        ).alias("clean_text"),
    )


# --------------------------------------------------------------------------
# data_d4_prototype_prune
# --------------------------------------------------------------------------

_D4_PCT = 10  # prune the top decile by cosine-to-centroid per cluster

_D4_SQL = f"""
    WITH src AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    cw AS (
      SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm FROM src
    ),
    per_dim AS (
      SELECT label, d,
             CAST(sum(CAST(floor(e[d] * 1e6) AS BIGINT)) AS DOUBLE)
               / CAST(1000000 * count(*) AS DOUBLE) AS cval
      FROM src, generate_series(1, 64) t(d)
      GROUP BY label, d
    ),
    cent AS (
      SELECT label, list(cval ORDER BY d) AS ce FROM per_dim GROUP BY label
    ),
    cent_n AS (
      SELECT label AS cl, ce, sqrt(list_inner_product(ce, ce)) AS cn FROM cent
    ),
    assign AS (
      SELECT vec_id, cl, sim
      FROM (
        SELECT cw.vec_id, cn.cl,
               round(list_inner_product(cw.e, cn.ce)
                     / (cw.nrm * cn.cn), 6) AS sim,
               row_number() OVER (
                 PARTITION BY cw.vec_id
                 ORDER BY round(list_inner_product(cw.e, cn.ce)
                                / (cw.nrm * cn.cn), 6) DESC, cn.cl) AS rn
        FROM cw CROSS JOIN cent_n cn
        WHERE cw.nrm > 0
      ) WHERE rn = 1
    ),
    sizes AS (SELECT cl, CAST(count(*) AS BIGINT) AS csz FROM assign GROUP BY 1),
    ranked AS (
      SELECT a.vec_id, a.cl, a.sim, s.csz,
             row_number() OVER (
               PARTITION BY a.cl ORDER BY a.sim DESC, a.vec_id) AS rnk
      FROM assign a JOIN sizes s USING (cl)
    )
    SELECT vec_id, cl AS cluster_id,
           CAST(round(sim * 1000000, 0) AS BIGINT) AS cos_micro,
           CAST(rnk AS BIGINT) AS proto_rank,
           csz AS cluster_size,
           rnk > (csz * {_D4_PCT}) // 100 AS is_kept
    FROM ranked
"""


@register(
    "data_d4_prototype_prune",
    oracle=_D4_SQL,
    tags=("data", "dedup", "llm", "similarity", "curation"),
)
def data_d4_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 diversification stage (Tirumala et al. 2023): SemDeDup removes
    within-cluster near-DUPLICATES (dedup_semdedup_prune); D4 then also
    removes the most cluster-PROTOTYPICAL points — the vectors closest
    to their centroid, i.e. the redundant low-information core the
    paper shows re-training benefits from dropping. Every embedding is
    assigned to its nearest exact centroid and ranked within the
    cluster by rounded cosine-to-centroid (descending, vec_id
    tiebreak); the top {_D4_PCT}% (floor) of each cluster is pruned.
    Output: one row per vector with its cluster, cosine (micro),
    prototypicality rank, cluster size, and keep verdict.

    Plan shape: centroids are the trained exact fixed-point quantizer
    shared with sim_topk_ivf_exact / dedup_semdedup_prune
    (operators/similarity.exact_centroid_arrays — integer per-dim
    sums, bit-identical across engines), collected to ONE broadcast
    row; assignment is a zero-exchange per-row arg-max over that
    broadcast array which KEEPS the winning cosine (no recompute); the
    only shuffles are the cluster-size aggregate and the per-cluster
    rank window — both at cluster grain. No pair join anywhere: D4's
    prototype prune is strictly cheaper than SemDeDup's pair
    enumeration. At 100 TB the centroid count k scales with the corpus
    (k ~ N/target_cluster_size), keeping per-cluster window partitions
    bounded."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = S.exact_centroid_arrays(S.with_norm(e), "label")
    cent_row = cents.agg(
        F.collect_list(F.struct("pt", "c_vec", "c_norm")).alias("cents")
    )
    corpus = S.with_norm(widen_narrow_scan(e)).where(F.col("_norm") > 0)
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda cn: F.struct(
                F.round(
                    S.cosine(
                        F.col("_vec"), F.col("_norm"), cn["c_vec"], cn["c_norm"]
                    ),
                    6,
                ).alias("sim"),
                (-cn["pt"]).alias("negpt"),
            ),
        )
    )
    assigned = corpus.crossJoin(F.broadcast(cent_row)).select(
        "vec_id",
        (-best.getField("negpt")).cast("int").alias("cl"),
        best.getField("sim").alias("sim"),
    )
    sizes = assigned.groupBy("cl").agg(F.count("*").cast("bigint").alias("csz"))
    wr = Window.partitionBy("cl").orderBy(F.col("sim").desc(), F.col("vec_id"))
    ranked = (
        assigned.join(F.broadcast(sizes), "cl")
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
    )
    return ranked.select(
        "vec_id",
        F.col("cl").alias("cluster_id"),
        F.round(F.col("sim") * 1000000, 0).cast("bigint").alias("cos_micro"),
        F.col("rnk").alias("proto_rank"),
        F.col("csz").alias("cluster_size"),
        (F.col("rnk") > F.expr(f"(csz * {_D4_PCT}) div 100")).alias("is_kept"),
    )


# --------------------------------------------------------------------------
# eval_bt_strength
# --------------------------------------------------------------------------

_BT_GRID = 1000  # reward-score grid: one bucket per 1000 milli (1.0 weight)

_BT_SQL = f"""
    WITH s AS (
      SELECT source,
             [w for w in string_split(text, ' ') if len(w) > 0] AS ws
      FROM documents
    ),
    sc AS (
      SELECT source,
             CAST(floor(coalesce(list_sum(list_transform(ws,
               w -> list_reduce(list_prepend(0,
                      [CAST(ord(c) AS BIGINT) for c in string_split(w, '')]),
                      (acc, c) -> (acc * 31 + c) % 1048576) % 2001 - 1000)),
               0) / {_BT_GRID}.0) AS BIGINT) AS b
      FROM s
    ),
    hist AS (
      SELECT source, b, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY 1, 2
    ),
    pairw AS (
      SELECT h1.source AS s1, h2.source AS s2,
             CAST(sum(CASE WHEN h1.b > h2.b THEN 2 * h1.c * h2.c
                           WHEN h1.b = h2.b THEN h1.c * h2.c
                           ELSE 0 END) AS HUGEINT) AS wins2,
             CAST(sum(h1.c * h2.c) AS HUGEINT) AS games
      FROM hist h1 JOIN hist h2 ON h1.source <> h2.source
      GROUP BY 1, 2
    ),
    per AS (
      SELECT s1 AS source,
             CAST(sum(wins2) AS HUGEINT) AS w2,
             CAST(sum(games) AS HUGEINT) AS n
      FROM pairw GROUP BY 1
    ),
    g1 AS (
      SELECT source, w2, n,
             greatest((2 * w2 * 1000000 + n) // (2 * n),
                      CAST(1 AS HUGEINT)) AS gm1
      FROM per
    ),
    denom AS (
      SELECT p.s1 AS source,
             CAST(sum((2 * p.games * 1000000000000 + (a.gm1 + b.gm1))
                      // (2 * (a.gm1 + b.gm1))) AS HUGEINT) AS dn
      FROM pairw p
      JOIN g1 a ON a.source = p.s1
      JOIN g1 b ON b.source = p.s2
      GROUP BY 1
    ),
    docs AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM sc GROUP BY 1
    )
    SELECT g1.source,
           docs.n_docs,
           CAST(g1.n AS DECIMAL(38, 0)) AS games,
           CAST(g1.w2 AS DECIMAL(38, 0)) AS wins2,
           CAST(g1.gm1 AS BIGINT) AS gamma1_micro,
           CAST((g1.w2 * 1000000000000 + denom.dn)
                // (2 * denom.dn) AS BIGINT) AS gamma2_micro
    FROM g1 JOIN denom USING (source) JOIN docs USING (source)
"""


@register(
    "eval_bt_strength",
    oracle=_BT_SQL,
    tags=("eval", "llm", "stat"),
)
def eval_bt_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength of data SOURCES under the frozen linear
    reward model — the Chatbot-Arena-style pairwise-preference
    aggregation applied to corpus curation: every cross-source document
    pair is a virtual head-to-head judged by the frozen reward score
    (quality_fasttext_linear's scorer, quantized to a {_BT_GRID}-milli
    grid; grid ties count half a win each), and two Bradley-Terry
    minorization-maximization iterations (Hunter 2004) turn the win
    matrix into per-source strengths. gamma1 is the closed first MM
    step (2·wins/games); gamma2 re-weights each opponent by the
    iteration-1 strengths. All arithmetic after the scan is exact
    fixed-point integer (round-half-up micro; per-term integer
    division at 1e12 scale) — bit-identical across engines, no float
    anywhere past the score grid.

    Plan shape — pairwise preferences WITHOUT pair enumeration: the
    corpus scan is the zero-exchange linear scorer; ONE map-side-
    combinable groupBy builds the (source × grid-bucket) histogram,
    which is domain-bounded (sources × score-grid, independent of
    corpus size); the win matrix is the histogram's self theta-join
    and every MM step runs on the sources-sized frame. At 100 TB the
    only data-sized cost is the scan+histogram — the N² virtual games
    are counted, never materialized. Domain bound (the data_dpo_pairs
    posture): per-ordered-pair game counts must stay < ~9e12 for the
    1e12-scale fixed-point terms to fit the integral-divide range;
    beyond that, widen the fixed-point scale. ASCII contract: inherits
    linear_word_weight's ``F.ascii`` ↔ ``ord`` portability bound
    (exact on ASCII corpora; normalize non-ASCII text first)."""
    from etl_caic_spark.plans.wave19a import linear_doc_score

    d = load_table(spark, sf_dir, "documents")
    _, total = linear_doc_score(F.col("text"))
    sc = widen_narrow_scan(d).select(
        "source",
        F.floor(total / F.lit(float(_BT_GRID))).cast("bigint").alias("b"),
    )
    hist = sc.groupBy("source", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )
    h1 = hist.select(
        F.col("source").alias("s1"), F.col("b").alias("b1"), F.col("c").alias("c1")
    )
    h2 = hist.select(
        F.col("source").alias("s2"), F.col("b").alias("b2"), F.col("c").alias("c2")
    )
    pairw = (
        h1.join(F.broadcast(h2), F.col("s1") != F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum(
                F.when(F.col("b1") > F.col("b2"), 2 * F.col("c1") * F.col("c2"))
                .when(F.col("b1") == F.col("b2"), F.col("c1") * F.col("c2"))
                .otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("wins2"),
            F.sum(F.col("c1") * F.col("c2")).cast("decimal(38,0)").alias("games"),
        )
    )
    per = pairw.groupBy(F.col("s1").alias("source")).agg(
        F.sum("wins2").cast("decimal(38,0)").alias("w2"),
        F.sum("games").cast("decimal(38,0)").alias("n"),
    )
    g1 = per.select(
        "source",
        "w2",
        "n",
        F.greatest(
            F.expr("(2 * w2 * 1000000 + n) div (2 * n)"), F.lit(1).cast("bigint")
        ).alias("gm1"),
    )
    ga = g1.select(F.col("source").alias("s1"), F.col("gm1").alias("gm1a"))
    gb = g1.select(F.col("source").alias("s2"), F.col("gm1").alias("gm1b"))
    denom = (
        pairw.join(F.broadcast(ga), "s1")
        .join(F.broadcast(gb), "s2")
        .groupBy(F.col("s1").alias("source"))
        .agg(
            F.sum(
                F.expr(
                    "(2 * games * 1000000000000 + (gm1a + gm1b))"
                    " div (2 * (gm1a + gm1b))"
                )
            )
            .cast("decimal(38,0)")
            .alias("dn")
        )
    )
    # n_docs folds from the histogram (sum of bucket counts) — the
    # corpus is scanned exactly once; Catalyst reuses the hist exchange
    docs = hist.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_docs"))
    return (
        g1.join(denom, "source")
        .join(docs, "source")
        .select(
            "source",
            "n_docs",
            F.col("n").alias("games"),
            F.col("w2").alias("wins2"),
            F.col("gm1").cast("bigint").alias("gamma1_micro"),
            F.expr("(w2 * 1000000000000 + dn) div (2 * dn)")
            .cast("bigint")
            .alias("gamma2_micro"),
        )
    )
