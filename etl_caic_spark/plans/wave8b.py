"""Round-8 wave B: hierarchy flattening by pointer jumping, DSIR-style
importance resampling, a Holt linear-trend smoother compiled to closed
form, and an l-diversity privacy audit.

Four capability classes the engine did not cover yet:

- ``hierarchy_flatten``: org-chart / BOM root-and-depth resolution. The
  naive per-level loop needs O(depth) joins; pointer jumping (each round
  replaces every node's ancestor pointer with its ancestor's ancestor)
  needs O(log2 depth) — 5 rounds cover depth 32, past the depth-18
  ceiling of any int64 decimal-trie key. The oracle is DuckDB's WITH
  RECURSIVE walking
  the same synthetic parent function, so the distributed doubling loop
  is verified against the textbook sequential definition.
- ``data_importance_resample``: DSIR-style (hashed n-gram importance
  sampling) corpus selection — score every document by how much more
  likely its hashed-unigram buckets are under the target domain
  (lang='en') than under the whole corpus, take the top-k. Logs follow
  the registry micro-nat convention (ln of INTEGERS only, rounded once
  per distinct value), so the per-doc sum is BIGINT-exact on both
  engines.
- ``ts_holt_linear``: Holt's linear-trend double smoother with
  alpha=beta=1/2. The recurrence is a linear state-space, so the
  depth-8-truncated level/trend are CLOSED-FORM dot products of the lag
  chain; the coefficients are dyadic rationals computed exactly in
  binary floating point at import time and inlined as literals in the
  SAME order in both engines — a single window projection instead of a
  2^depth-node nested expression.
- ``priv_l_diversity``: the k-anonymity companion (priv_k_anonymity,
  privacyq.py) — per quasi-identifier group, count distinct sensitive
  values and the modal sensitive share; flag l < 3 groups.

Reference parity: the reference (task.ts:88-189) has no hierarchy /
curation / privacy surface — these are the LLM-pipeline and warehouse
extension mandate (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.hierarchy import resolve_decimal_trie
from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# hierarchy_flatten
# --------------------------------------------------------------------------

_HIERARCHY_SQL = """
    WITH RECURSIVE up AS (
      SELECT c_custkey AS k, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
      FROM customer
      UNION ALL
      SELECT k, cur // 10, depth + 1 FROM up WHERE cur >= 10
    )
    SELECT k AS c_custkey, cur AS root_key, depth
    FROM up WHERE cur < 10
"""


@register("hierarchy_flatten", oracle=_HIERARCHY_SQL, tags=("hierarchy", "graph", "scale"))
def hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every node of a synthetic decimal-trie hierarchy
    (parent(k) = k div 10; keys < 10 are roots) to its root and depth by
    POINTER JUMPING: each round self-joins the frame on ancestor = key
    and doubles the hop distance it has collapsed, so 5 rounds resolve
    any depth <= 32 — past the depth-18 ceiling of decimal int64 keys.
    This is the distributed plan for org charts, BOMs
    and category trees — O(log depth) shuffles instead of the O(depth)
    of per-level iteration, each round one hash join on the ancestor
    key plus an exact BIGINT depth accumulation.

    The oracle is the sequential textbook definition (WITH RECURSIVE
    parent walk), so the doubling loop is verified node-for-node.
    The jump table is built over the CLOSURE of the key set under
    parent() — every intermediate ancestor gets a row even when it is
    not itself a customer key — so the per-round inner join is total on
    any key distribution (a sampled or filtered snapshot), not just the
    dense fixture; the closure costs one 19-element explode + distinct.
    At 100 TB: the frame stays hash-partitioned on k; round r's join
    shuffles only the (k, anc, d) triple — 24 bytes/row — and roots
    reach their fixpoint (anc = k, d stable) immediately, so AQE sees
    shrinking build sides round over round."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return resolve_decimal_trie(cust).select(
        F.col("k").alias("c_custkey"), "root_key", "depth"
    )


# --------------------------------------------------------------------------
# data_importance_resample (DSIR-style)
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TOPK = 100

_DSIR_SQL = f"""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tok AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('dsir-v1|' || w), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS b
      FROM words
    ),
    agg AS (
      SELECT b,
             CAST(count(*) AS BIGINT) AS bcnt,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tcnt
      FROM tok GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(bcnt) AS BIGINT) AS btot,
             CAST(sum(tcnt) AS BIGINT) AS ttot
      FROM agg
    ),
    scores AS (
      SELECT b,
             (CAST(round(round(ln(tcnt + 1), 6) * 1e6) AS BIGINT)
              - CAST(round(round(ln(ttot + {_DSIR_BUCKETS}), 6) * 1e6) AS BIGINT)
              - CAST(round(round(ln(bcnt + 1), 6) * 1e6) AS BIGINT)
              + CAST(round(round(ln(btot + {_DSIR_BUCKETS}), 6) * 1e6) AS BIGINT)
             ) AS s
      FROM agg, tot
    ),
    docs AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(s.s) AS BIGINT) AS score_micro_nats
      FROM tok t JOIN scores s ON s.b = t.b
      GROUP BY 1
    )
    SELECT d.doc_id, dd.lang, d.n_tokens, d.score_micro_nats
    FROM docs d JOIN documents dd ON dd.doc_id = d.doc_id
    ORDER BY d.score_micro_nats DESC, d.doc_id
    LIMIT {_DSIR_TOPK}
"""


@register("data_importance_resample", oracle=_DSIR_SQL, tags=("llm", "sampling", "quality"))
def data_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling: hashed-unigram bucket counts
    under the target domain (lang='en') vs the whole corpus give a
    per-bucket add-one-smoothed log-likelihood ratio; each document's
    importance score is the BIGINT-exact sum of its tokens' bucket
    ratios (micro-nat convention — ln is only ever taken of integers,
    rounded once per distinct value), and the top-100 by (score desc,
    doc_id) are the resampled corpus.

    Plan shape: one tokenize scan -> 256-row bucket aggregate (map-side
    combinable) -> broadcast of the 256-row score table back onto the
    token stream -> per-doc sum -> TakeOrderedAndProject for the top-k
    (no global sort materialization). At 100 TB the only corpus-sized
    shuffles are keyed by doc_id; the importance model itself is 256
    rows however large the corpus — the point of hashed DSIR."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    tok = words.select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir-v1|"), F.col("w"))), 1, 15),
                16,
                10,
            ).cast("bigint")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    agg = tok.groupBy("b").agg(
        F.count("*").cast("bigint").alias("bcnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint").alias("tcnt"),
    )
    tot = agg.agg(
        F.sum("bcnt").cast("bigint").alias("btot"),
        F.sum("tcnt").cast("bigint").alias("ttot"),
    )
    scores = agg.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            iln(F.col("tcnt") + 1)
            - iln(F.col("ttot") + _DSIR_BUCKETS)
            - iln(F.col("bcnt") + 1)
            + iln(F.col("btot") + _DSIR_BUCKETS)
        ).alias("s"),
    )
    docs = tok.join(F.broadcast(scores), "b").groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("s").cast("bigint").alias("score_micro_nats"),
    )
    return (
        docs.join(d.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("score_micro_nats"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
        .select("doc_id", "lang", "n_tokens", "score_micro_nats")
    )


# --------------------------------------------------------------------------
# ts_holt_linear
# --------------------------------------------------------------------------

_HOLT_DEPTH = 8


def _holt_coefficients(depth: int) -> tuple[list[float], list[float]]:
    """Exact dyadic coefficients of y_{t-j} in the depth-truncated Holt
    level and trend (alpha = beta = 1/2, zero-initialised at lag depth).

    The recurrence  l' = (y + l + b)/2,  b' = (y - l)/4 + 3b/4  is
    linear, so l_t = sum_j a_j * y_{t-j}: the a_j are rationals with
    power-of-two denominators and numerators << 2^53, hence every float
    operation below (halving, quartering, 0.75x, adds) is EXACT, and the
    resulting literals are bit-identical constants in both engines."""
    coef_l = [0.0] * (depth + 1)  # coef_l[j] multiplies lag j
    coef_b = [0.0] * (depth + 1)
    for step in range(depth, -1, -1):  # feed y at lag `step`, oldest first
        new_l = [0.5 * (coef_l[j] + coef_b[j]) for j in range(depth + 1)]
        new_b = [-0.25 * coef_l[j] + 0.75 * coef_b[j] for j in range(depth + 1)]
        new_l[step] += 0.5
        new_b[step] += 0.25
        coef_l, coef_b = new_l, new_b
    return coef_l, coef_b


_HOLT_L, _HOLT_B = _holt_coefficients(_HOLT_DEPTH)


def _holt_dot_sql(coefs: list[float]) -> str:
    # CAST('…' AS DOUBLE): DuckDB parses bare decimal literals as
    # DECIMAL; the string cast goes straight to the nearest double, the
    # same bits F.lit(float) embeds on the Spark side.
    terms = [f"CAST('{coefs[0]!r}' AS DOUBLE) * value"]
    terms += [
        f"CAST('{coefs[j]!r}' AS DOUBLE) * coalesce(lag(value, {j}) OVER w, 0.0)"
        for j in range(1, len(coefs))
    ]
    return "(" + " + ".join(terms) + ")"


_HOLT_SQL = f"""
    WITH chain AS (
      SELECT user_id,
             {_holt_dot_sql(_HOLT_L)} AS lvl,
             {_holt_dot_sql(_HOLT_B)} AS trd,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           round(lvl, 6) AS level_last,
           round(trd, 6) AS trend_last,
           round(lvl + trd, 6) AS forecast_next
    FROM chain WHERE rn = 1
"""


@register("ts_holt_linear", oracle=_HOLT_SQL, tags=("timeseries", "window"))
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoother (alpha=beta=1/2,
    depth-8 truncation) over each user's event values, reported at the
    latest event with the one-step forecast level+trend. The recurrence
    is a linear state-space, so instead of a 2^depth-node nested
    expression the truncated level/trend are CLOSED-FORM dot products
    over the lag chain with exact dyadic coefficients (module
    docstring) — one window projection, identical literal text on both
    engines, bit-identical doubles before the final display rounding.

    At 100 TB: one hash shuffle on user_id + one sort — the cost of any
    windowed feature; no Python, no per-row state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))

    def dot(coefs: list[float]) -> Column:
        acc = F.lit(coefs[0]) * F.col("value")
        for j in range(1, len(coefs)):
            acc = acc + F.lit(coefs[j]) * F.coalesce(F.lag("value", j).over(w), F.lit(0.0))
        return acc

    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    chain = ev.select(
        "user_id",
        dot(_HOLT_L).alias("lvl"),
        dot(_HOLT_B).alias("trd"),
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wc).alias("n_events"),
    )
    return chain.filter(F.col("rn") == 1).select(
        "user_id",
        "n_events",
        F.round(F.col("lvl"), 6).alias("level_last"),
        F.round(F.col("trd"), 6).alias("trend_last"),
        F.round(F.col("lvl") + F.col("trd"), 6).alias("forecast_next"),
    )


# --------------------------------------------------------------------------
# priv_l_diversity
# --------------------------------------------------------------------------

_LDIV_SQL = """
    WITH j AS (
      SELECT c_nationkey, c_mktsegment, o_orderpriority
      FROM customer JOIN orders ON o_custkey = c_custkey
    ),
    per AS (
      SELECT c_nationkey, c_mktsegment, o_orderpriority,
             CAST(count(*) AS BIGINT) AS c
      FROM j GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS l_distinct,
             CAST(max(c) AS BIGINT) AS max_sens
      FROM per GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, n_rows, l_distinct,
           round(max_sens * 1.0 / n_rows, 6) AS max_share,
           l_distinct < 3 AS at_risk
    FROM grp
"""


@register("priv_l_diversity", oracle=_LDIV_SQL, tags=("privacy", "dq"))
def priv_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the release-gate companion to priv_k_anonymity
    (privacyq.py): per quasi-identifier group (nation, market segment),
    the number of DISTINCT sensitive values (order priority), the modal
    sensitive share (homogeneity-attack exposure), and an at_risk flag
    for l < 3. Two map-side-combinable groupBys — (QI, sensitive) then
    QI — so the shuffle carries at most |QI|x|sensitive| rows however
    large the fact table; the broadcast dim join keeps the fact scan
    shuffle-free. At 100 TB: the same two partial-agg reduces."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "c_nationkey", "c_mktsegment", "o_orderpriority"
    )
    per = j.groupBy("c_nationkey", "c_mktsegment", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("c")
    )
    grp = per.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("l_distinct"),
        F.max("c").cast("bigint").alias("max_sens"),
    )
    return grp.select(
        "c_nationkey",
        "c_mktsegment",
        "n_rows",
        "l_distinct",
        F.round(F.col("max_sens") * 1.0 / F.col("n_rows"), 6).alias("max_share"),
        (F.col("l_distinct") < 3).alias("at_risk"),
    )
