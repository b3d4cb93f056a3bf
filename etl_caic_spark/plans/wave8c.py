"""Round-8 wave C: hybrid retrieval fusion, HITS link analysis, and
corpus BLEU — three more capability classes for the LLM-data surface.

- ``rag_rrf_fusion``: reciprocal-rank fusion of a lexical (TF-IDF over
  the corpus's heaviest terms) ranking and a semantic (cosine to a query
  embedding) ranking — the standard hybrid-retrieval combiner. Both
  ranks are integers and each RRF contribution round(1e6/(60+rank)) is
  a single scalar division rounded once, so the fused score is
  BIGINT-exact on both engines.
- ``graph_hits``: hubs-and-authorities power iteration (3 rounds) over
  the deterministic consecutive-event graph shared with graph_pagerank
  (graphq.py:22). Scores live in integer micro-units; each round
  re-normalizes by the round's max (an exact integer), so the only
  float op per value is one divide-then-round — the same frozen
  fixed-point discipline as the pagerank/SSSP siblings.
- ``eval_bleu_corpus``: corpus-level BLEU-2 between paired documents
  (even doc_id = reference, odd = hypothesis) with clipped n-gram
  precision and brevity penalty, reported in LOG space: ln p_n comes
  from micro-nat logs of INTEGER count sums (registry convention), and
  the brevity term is one rounded scalar division — no exp() is ever
  taken, because libm exp differs across engines.

Reference parity: none of these exist in the reference (task.ts has no
retrieval/graph/eval surface) — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators import similarity as S
from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# rag_rrf_fusion
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPK = 20
_RRF_QTERMS = 10
# Per-leg candidate-pool depth. Provably deep enough for top-20 fusion:
# the 20th-best fused score is >= round(1e6/(60+20)) = 12500 (the sem
# top-20 alone reach that), while a document OUTSIDE both top-200 pools
# scores at most 2*round(1e6/(60+201)) = 7662 < 12500 — so no document
# beyond the pools can enter the fused top-20, whatever the data.
_RRF_CAND = 200

_RRF_SQL = f"""
    WITH tfx AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfx GROUP BY 1),
    qterms AS (
      SELECT term FROM tfx GROUP BY term
      ORDER BY sum(tf) DESC, term ASC LIMIT {_RRF_QTERMS}
    ),
    lex AS (
      SELECT doc_id,
             CAST(sum(tf * (CAST(round(round(ln(n_docs), 6) * 1e6) AS BIGINT)
                            - CAST(round(round(ln(df), 6) * 1e6) AS BIGINT)))
                  AS BIGINT) AS lex_micro
      FROM tfx JOIN qterms USING (term) JOIN dfs ON tfx.term = dfs.term
      CROSS JOIN nd
      GROUP BY 1
    ),
    lrank AS (
      SELECT doc_id, lex_rank FROM (
        SELECT doc_id, CAST(row_number() OVER (
                 ORDER BY lex_micro DESC, doc_id) AS BIGINT) AS lex_rank
        FROM lex
      ) WHERE lex_rank <= {_RRF_CAND}
    ),
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT e, nrm FROM emb WHERE vec_id = 0),
    srank AS (
      SELECT doc_id, sem_rank FROM (
        SELECT c.vec_id AS doc_id,
               CAST(row_number() OVER (
                 ORDER BY round(list_inner_product(q.e, c.e) / (q.nrm * c.nrm), 6)
                          DESC, c.vec_id) AS BIGINT) AS sem_rank
        FROM emb c CROSS JOIN q
      ) WHERE sem_rank <= {_RRF_CAND}
    )
    SELECT coalesce(s.doc_id, l.doc_id) AS doc_id,
           l.lex_rank,
           s.sem_rank,
           (coalesce(CAST(round(1e6 / ({_RRF_K} + l.lex_rank)) AS BIGINT), 0)
            + coalesce(CAST(round(1e6 / ({_RRF_K} + s.sem_rank)) AS BIGINT), 0))
             AS rrf_micro
    FROM srank s FULL OUTER JOIN lrank l ON l.doc_id = s.doc_id
    ORDER BY rrf_micro DESC, doc_id ASC
    LIMIT {_RRF_TOPK}
"""


_iln = iln  # shared micro-nat integer log (operators/micronat.py)


def _pool_rank(pool: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """Rank a TakeOrderedAndProject candidate pool (<= _RRF_CAND rows) by
    (score desc, doc_id asc): row_number over the N-bounded pool — the
    frame is already a single partition after the limit, so the window
    is one task of constant work at any corpus size.

    r16: this replaces a broadcast count-smaller self-join. The
    self-join's two pool instances sat on opposite sides of a
    BroadcastExchange, which ReusedExchange cannot collapse — each
    leg's ENTIRE scoring pipeline (the corpus-wide tf aggregate / the
    cosine scan) executed twice per rank call (wave A's PQ-anchor find,
    same law). Values identical: rank = 1 + count of strictly-better ==
    row_number under the total (score desc, doc_id asc) order."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    return pool.select(
        "doc_id", F.row_number().over(w).cast("bigint").alias(rank_name)
    )


@register("rag_rrf_fusion", oracle=_RRF_SQL, tags=("retrieval", "llm", "similarity"))
def rag_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (k=60): a lexical
    TF-IDF ranking over the corpus's 10 heaviest terms (micro-nat
    integer idf — ln of integer counts only) fused with a semantic
    ranking by cosine to the vec_id=0 query embedding. RRF keeps only
    the RANKS — integers — so rrf_micro = round(1e6/(60+r_lex)) +
    round(1e6/(60+r_sem)) is exact on both engines; a document missing
    from a leg's candidate list contributes 0 for that leg, the
    standard RRF-over-retrieved-lists convention.

    Plan shape: tf groupBy (partial-agg) + broadcast df/query-term dims
    for the lexical leg; one broadcast of the single query vector over
    the embeddings scan for the semantic leg. Each leg keeps only its
    top-200 candidates via TakeOrderedAndProject (no global sort — see
    _RRF_CAND for the proof that 200 is deep enough for exact top-20
    fusion), and ranks within the 200-row pools come from a broadcast
    count-smaller self-join (_pool_rank — constant work on the
    N-bounded frame), so the plan carries NO Window operator at all at
    any corpus size; the fused frame is N-bounded, not corpus-bounded."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    qterms = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("wt"))
        .orderBy(F.desc("wt"), F.asc("term"))
        .limit(_RRF_QTERMS)
        .select("term")
    )
    lex = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            (F.col("tf") * (_iln(F.col("n_docs")) - _iln(F.col("df")))).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").cast("bigint").alias("lex_micro"))
    )
    lex_top = lex.orderBy(F.desc("lex_micro"), F.asc("doc_id")).limit(_RRF_CAND)
    lrank = _pool_rank(lex_top, "lex_micro", "lex_rank")
    emb = S.with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("_vec").alias("q_vec"), F.col("_norm").alias("q_norm")
    )
    sem_scores = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            S.cosine(F.col("q_vec"), F.col("q_norm"), F.col("_vec"), F.col("_norm")),
            6,
        ).alias("cosine"),
    )
    sem_top = sem_scores.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(_RRF_CAND)
    srank = _pool_rank(sem_top, "cosine", "sem_rank")
    fused = srank.join(lrank, "doc_id", "full").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.round(F.lit(1e6) / (F.lit(_RRF_K) + F.col("lex_rank"))).cast("bigint"),
                F.lit(0),
            )
            + F.coalesce(
                F.round(F.lit(1e6) / (F.lit(_RRF_K) + F.col("sem_rank"))).cast("bigint"),
                F.lit(0),
            )
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(_RRF_TOPK)


# --------------------------------------------------------------------------
# graph_hits
# --------------------------------------------------------------------------

_HITS_ITER = 3
_HITS_UNIT = 1000000

_HITS_EDGES_SQL = """
    ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    seq AS (
      SELECT lag(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS src,
             user_id AS dst
      FROM ev
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM seq
      WHERE src IS NOT NULL AND src <> dst
    ),
    nodes AS (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
      )
    )
"""


def _hits_oracle() -> str:
    parts = [
        "WITH "
        + _HITS_EDGES_SQL
        + f""",
    h0 AS (SELECT v, CAST({_HITS_UNIT} AS BIGINT) AS h FROM nodes)"""
    ]
    prev_h = "h0"
    for i in range(1, _HITS_ITER + 1):
        parts.append(f"""
    ar{i} AS (
      SELECT e.dst AS v, CAST(sum(h.h) AS BIGINT) AS a
      FROM edges e JOIN {prev_h} h ON h.v = e.src
      GROUP BY 1
    ),
    af{i} AS (
      SELECT nodes.v, CAST(coalesce(a, 0) AS BIGINT) AS a
      FROM nodes LEFT JOIN ar{i} ON nodes.v = ar{i}.v
    ),
    am{i} AS (SELECT max(a) AS m FROM af{i}),
    a{i} AS (
      SELECT v, CAST(round(a * {_HITS_UNIT}.0 / m) AS BIGINT) AS a
      FROM af{i} CROSS JOIN am{i}
    ),
    hr{i} AS (
      SELECT e.src AS v, CAST(sum(a.a) AS BIGINT) AS h
      FROM edges e JOIN a{i} a ON a.v = e.dst
      GROUP BY 1
    ),
    hf{i} AS (
      SELECT nodes.v, CAST(coalesce(h, 0) AS BIGINT) AS h
      FROM nodes LEFT JOIN hr{i} ON nodes.v = hr{i}.v
    ),
    hm{i} AS (SELECT max(h) AS m FROM hf{i}),
    h{i} AS (
      SELECT v, CAST(round(h * {_HITS_UNIT}.0 / m) AS BIGINT) AS h
      FROM hf{i} CROSS JOIN hm{i}
    )""")
        prev_h = f"h{i}"
    return (
        ",".join(parts).replace("WITH ,", "WITH ")
        + f"""
    SELECT h{_HITS_ITER}.v AS user_id,
           h{_HITS_ITER}.h AS hub_micro,
           a{_HITS_ITER}.a AS auth_micro
    FROM h{_HITS_ITER} JOIN a{_HITS_ITER} ON h{_HITS_ITER}.v = a{_HITS_ITER}.v
    """
    )


@register("graph_hits", oracle=_hits_oracle(), tags=("graph", "iterative"))
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities, 3 power-iteration rounds over the
    deterministic consecutive-event edge list shared with graph_pagerank
    (graphq.py:22). Authority(v) = sum of hub scores over in-edges, then
    hub(u) = sum of authority scores over out-edges; after each half-step
    the scores are renormalized to [0, 1e6] by the round's MAX — an
    exact integer — so the single float op per value is one
    divide-then-round, replayed identically by the unrolled-CTE oracle.

    Plan per round: two hash joins (edges against the score frame, keyed
    src then dst) + two map-side-combinable groupBys + one broadcast
    scalar max. Unlike pagerank (whose rounds chain lazily into one
    job), each renormalization embeds a scalar-max subquery, so the
    score frame is localCheckpoint-ed per half-step — otherwise every
    max re-executes the entire upstream lineage and the 6 half-steps go
    super-linear (observed 21.6 s -> ~2 s at sf0.1). At 100 TB: edges
    checkpoint hash-partitioned once and every round's shuffle is linear
    in |E| — the pagerank profile plus one O(|V|) max per half-step.
    Integer
    headroom: sum <= deg_max * 1e6, and the *1e6 renormalization
    multiply happens in DOUBLE, so there is no bigint overflow at any
    degree; past deg_max ~ 1e9 the product exceeds 2^53 and the
    low-order micro-digits quantize (identically on both engines — the
    plan stays hash-exact, the scores lose sub-ppm resolution)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .localCheckpoint()  # 12 join consumers across the 3 rounds
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.select("v", F.lit(_HITS_UNIT).cast("bigint").alias("h"))

    def normalize(frame: DataFrame, col: str) -> DataFrame:
        # Cut lineage BEFORE the scalar-max subquery: the max's broadcast
        # subplan otherwise re-executes every preceding half-step.
        filled = (
            nodes.join(frame, "v", "left")
            .select(
                "v", F.coalesce(F.col(col), F.lit(0)).cast("bigint").alias(col)
            )
            .localCheckpoint()
        )
        mx = filled.agg(F.max(col).alias("m"))
        return filled.crossJoin(F.broadcast(mx)).select(
            "v",
            F.round(F.col(col) * F.lit(float(_HITS_UNIT)) / F.col("m"))
            .cast("bigint")
            .alias(col),
        )

    a = None
    for _ in range(_HITS_ITER):
        a_raw = (
            edges.join(h.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        a = normalize(a_raw, "a")
        h_raw = (
            edges.join(a.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
        h = normalize(h_raw, "h")
    return h.join(a, "v").select(
        F.col("v").alias("user_id"),
        F.col("h").alias("hub_micro"),
        F.col("a").alias("auth_micro"),
    )


# --------------------------------------------------------------------------
# eval_bleu_corpus
# --------------------------------------------------------------------------

_BLEU_SQL = """
    WITH pairs AS (
      SELECT doc_id // 2 AS pair_id,
             doc_id % 2 AS side,
             string_split(text, ' ') AS ws
      FROM documents
    ),
    uni AS (
      SELECT pair_id, side, w, CAST(count(*) AS BIGINT) AS c
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
             CAST(sum(h.c) AS BIGINT) AS total
      FROM (SELECT * FROM uni WHERE side = 1) h
      LEFT JOIN (SELECT * FROM uni WHERE side = 0) r
        ON r.pair_id = h.pair_id AND r.w = h.w
    ),
    clip2 AS (
      SELECT CAST(sum(least(h.c, coalesce(r.c, 0))) AS BIGINT) AS clipped,
             CAST(sum(h.c) AS BIGINT) AS total
      FROM (SELECT * FROM bi WHERE side = 1) h
      LEFT JOIN (SELECT * FROM bi WHERE side = 0) r
        ON r.pair_id = h.pair_id AND r.g = h.g
    ),
    lens AS (
      SELECT CAST(count(DISTINCT pair_id) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN side = 0 THEN len(ws) ELSE 0 END) AS BIGINT)
               AS len_ref,
             CAST(sum(CASE WHEN side = 1 THEN len(ws) ELSE 0 END) AS BIGINT)
               AS len_hyp
      FROM pairs
    ),
    terms AS (
      SELECT n_pairs, len_ref, len_hyp,
             c1.clipped AS clip1, c1.total AS tot1,
             c2.clipped AS clip2, c2.total AS tot2,
             CAST(least(0, round((1 - len_ref * 1.0 / len_hyp) * 1e6))
                  AS BIGINT) AS bp_micro,
             -- NULL when clipped = 0 (Spark's log(0) is NULL; DuckDB's
             -- ln(0) would hard-error) — a zero-overlap corpus reports
             -- ln_bleu2_micro NULL identically on both engines
             (CASE WHEN c1.clipped = 0 THEN NULL
                   ELSE CAST(round(round(ln(c1.clipped), 6) * 1e6) AS BIGINT)
              END
              - CAST(round(round(ln(c1.total), 6) * 1e6) AS BIGINT)) AS lnp1,
             (CASE WHEN c2.clipped = 0 THEN NULL
                   ELSE CAST(round(round(ln(c2.clipped), 6) * 1e6) AS BIGINT)
              END
              - CAST(round(round(ln(c2.total), 6) * 1e6) AS BIGINT)) AS lnp2
      FROM lens, clip1 c1, clip2 c2
    )
    SELECT n_pairs, len_ref, len_hyp, clip1, tot1, clip2, tot2, bp_micro,
           (bp_micro + CAST(round((lnp1 + lnp2) / 2.0) AS BIGINT))
             AS ln_bleu2_micro
    FROM terms
"""


@register("eval_bleu_corpus", oracle=_BLEU_SQL, tags=("eval", "llm", "text"))
def eval_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 between paired documents (even doc_id =
    reference, odd = hypothesis, pair = doc_id div 2): clipped unigram
    and bigram precisions plus brevity penalty, reported in LOG space —
    ln_bleu2_micro = bp + (ln p1 + ln p2)/2 in micro-nats. Every ln is
    of an INTEGER count sum (micro-nat convention) and the brevity term
    is one rounded scalar division, so the single output row is
    BIGINT-exact on both engines; exp() is never taken because libm exp
    is not cross-engine-portable.

    Plan shape: tokenize scan -> per-(pair, side, gram) counts (partial
    agg) -> hyp-vs-ref LEFT join keyed (pair_id, gram) — co-partitioned,
    linear in corpus grams — -> scalar fold. At 100 TB the join key
    (pair, gram) is near-unique so no skew; the final aggregate is one
    map-side-combinable reduce to a single row."""
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        F.expr("doc_id div 2").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.split("text", " ").alias("ws"),
    )
    uni = (
        pairs.select("pair_id", "side", F.explode("ws").alias("w"))
        .groupBy("pair_id", "side", "w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    bi = (
        # size >= 2 guard on BOTH engines: Spark's sequence(1, 0) yields
        # [1, 0] (descending), not empty — a 1-token doc would emit two
        # null grams here while DuckDB's generate_series emits none.
        pairs.filter(F.size("ws") >= 2)
        .select(
            "pair_id",
            "side",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(ws[i - 1], ' ', ws[i]))"
                )
            ).alias("g"),
        )
        .groupBy("pair_id", "side", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )

    def clip(grams: DataFrame, key: str) -> DataFrame:
        h = grams.filter(F.col("side") == 1).select("pair_id", key, F.col("c").alias("hc"))
        r = grams.filter(F.col("side") == 0).select("pair_id", key, F.col("c").alias("rc"))
        j = h.join(r, ["pair_id", key], "left")
        return j.agg(
            F.sum(F.least(F.col("hc"), F.coalesce(F.col("rc"), F.lit(0))))
            .cast("bigint")
            .alias("clipped"),
            F.sum("hc").cast("bigint").alias("total"),
        )

    c1 = clip(uni, "w").select(
        F.col("clipped").alias("clip1"), F.col("total").alias("tot1")
    )
    c2 = clip(bi, "g").select(
        F.col("clipped").alias("clip2"), F.col("total").alias("tot2")
    )
    lens = pairs.agg(
        F.countDistinct("pair_id").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("side") == 0, F.size("ws")).otherwise(0))
        .cast("bigint")
        .alias("len_ref"),
        F.sum(F.when(F.col("side") == 1, F.size("ws")).otherwise(0))
        .cast("bigint")
        .alias("len_hyp"),
    )
    terms = (
        lens.crossJoin(c1)
        .crossJoin(c2)
        .select(
            "n_pairs",
            "len_ref",
            "len_hyp",
            "clip1",
            "tot1",
            "clip2",
            "tot2",
            F.least(
                F.lit(0),
                F.round((F.lit(1) - F.col("len_ref") * 1.0 / F.col("len_hyp")) * 1e6),
            )
            .cast("bigint")
            .alias("bp_micro"),
            (_iln(F.col("clip1")) - _iln(F.col("tot1"))).alias("lnp1"),
            (_iln(F.col("clip2")) - _iln(F.col("tot2"))).alias("lnp2"),
        )
    )
    return terms.select(
        "n_pairs",
        "len_ref",
        "len_hyp",
        "clip1",
        "tot1",
        "clip2",
        "tot2",
        "bp_micro",
        (
            F.col("bp_micro")
            + F.round((F.col("lnp1") + F.col("lnp2")) / 2.0).cast("bigint")
        ).alias("ln_bleu2_micro"),
    )
