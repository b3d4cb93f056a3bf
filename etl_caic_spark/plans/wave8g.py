"""Round-8 wave G: Spearman rank correlation and truncated harmonic
centrality.

- ``stat_spearman``: Spearman's rho between a customer's account
  balance and their realized order revenue. Multiplying the classic
  formula through by n(n^2-1) makes every term BIGINT-exact:
      rho = (n(n^2-1) - 6*sum(d^2)) / (n(n^2-1)),
  one rounded division at the end. Ties rank by (value, custkey) — the
  frozen deterministic variant (midrank averaging would put halves in
  the ranks); documented and replayed identically by the oracle.
- ``graph_harmonic_centrality``: truncated harmonic centrality
  H(v) = sum_{u != v, d(u,v) <= 3} 1/d(u,v) over the deterministic
  sparse graph shared with graph_triangles/graph_adamic_adar. Layered
  BFS as three distinct-pair joins (exact-distance sets peel each
  previous layer), contributions frozen at 1e6/5e5/333333 micro-units.

Reference parity: none of this exists in the reference — SURVEY §2.C
extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.eventgraph import deterministic_event_edges, symmetrize
from etl_caic_spark.operators.prefix import with_global_order
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# stat_spearman
# --------------------------------------------------------------------------

_SPEARMAN_SQL = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
             rev_cents
      FROM customer JOIN rev ON o_custkey = c_custkey
    ),
    ranked AS (
      SELECT CAST(row_number() OVER (ORDER BY bal_cents, c_custkey) AS BIGINT)
               AS rx,
             CAST(row_number() OVER (ORDER BY rev_cents, c_custkey) AS BIGINT)
               AS ry
      FROM base
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS d2
      FROM ranked
    )
    SELECT n, d2,
           CAST(round((n * (n * n - 1) - 6 * d2) * 1000000.0
                      / (n * (n * n - 1))) AS BIGINT) AS rho_micro
    FROM agg
"""


@register("stat_spearman", oracle=_SPEARMAN_SQL, tags=("stats",))
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's rho between account balance and realized revenue per
    customer (integer cents; customers with at least one order). Both
    rank columns use the frozen (value, custkey) total order; the rho
    numerator and denominator are exact BIGINTs and the output is one
    rounded division in micro-units (see module docstring for the tie
    convention).

    Plan shape: revenue groupBy (fact partial agg) -> broadcast-joined
    customer dim -> TWO sequential range-partitioned prefix ranks
    (operators/prefix.py: range shuffle + partitioned windows + O(P)
    offset collects — no unpartitioned WindowExec at any customer
    count) -> single-row reduce. The hash match against the oracle's
    two global row_numbers proves the partitioned ranks reproduce them
    exactly. Bigint headroom: n(n^2-1) < 2^63
    holds through n ~ 2e6 customers per audited slice; past that the d2
    and n^3 terms ride the DECIMAL(38,0) ladder."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents")
    )
    base = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey).select(
        "c_custkey", "bal_cents", "rev_cents"
    )
    rx = with_global_order(base, ["bal_cents", "c_custkey"], rn_col="rx")
    ranked = with_global_order(rx, ["rev_cents", "c_custkey"], rn_col="ry").select(
        "rx", "ry"
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry")))
        .cast("bigint")
        .alias("d2"),
    )
    denom = F.col("n") * (F.col("n") * F.col("n") - 1)
    return agg.select(
        "n",
        "d2",
        F.round((denom - 6 * F.col("d2")) * 1000000.0 / denom)
        .cast("bigint")
        .alias("rho_micro"),
    )


# --------------------------------------------------------------------------
# graph_harmonic_centrality
# --------------------------------------------------------------------------

_HARMONIC_SQL = """
    WITH e AS (
      SELECT DISTINCT least(user_id, (user_id * 7 + event_id) % 150) AS a,
             greatest(user_id, (user_id * 7 + event_id) % 150) AS b
      FROM events
      WHERE event_id % 37 = 0
        AND user_id <> (user_id * 7 + event_id) % 150
    ),
    u AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    d1 AS (SELECT DISTINCT s AS v, d AS t FROM u),
    d2 AS (
      SELECT DISTINCT d1.v, u.d AS t
      FROM d1 JOIN u ON u.s = d1.t
      WHERE u.d <> d1.v
        AND NOT EXISTS (SELECT 1 FROM d1 i WHERE i.v = d1.v AND i.t = u.d)
    ),
    d3 AS (
      SELECT DISTINCT d2.v, u.d AS t
      FROM d2 JOIN u ON u.s = d2.t
      WHERE u.d <> d2.v
        AND NOT EXISTS (SELECT 1 FROM d1 i WHERE i.v = d2.v AND i.t = u.d)
        AND NOT EXISTS (SELECT 1 FROM d2 i WHERE i.v = d2.v AND i.t = u.d)
    ),
    cnt AS (
      SELECT v,
             CAST(count(*) FILTER (WHERE dist = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE dist = 2) AS BIGINT) AS n2,
             CAST(count(*) FILTER (WHERE dist = 3) AS BIGINT) AS n3
      FROM (
        SELECT v, 1 AS dist FROM d1
        UNION ALL SELECT v, 2 FROM d2
        UNION ALL SELECT v, 3 FROM d3
      ) GROUP BY 1
    )
    SELECT v AS user_id, n1, n2, n3,
           CAST(n1 * 1000000 + n2 * 500000 + n3 * 333333 AS BIGINT)
             AS harmonic_micro
    FROM cnt
"""


@register(
    "graph_harmonic_centrality", oracle=_HARMONIC_SQL, tags=("graph", "iterative")
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality truncated at 3 hops over the deterministic
    sparse graph (graphq.py:108 derivation): H(v) = n1/1 + n2/2 + n3/3
    with exact-distance layer sizes, frozen in integer micro-units
    (1e6, 5e5, 333333 per reachable node). Layers peel exactly: d2
    excludes self and d1, d3 excludes self, d1, d2 — left-anti joins,
    the relational mirror of frontier BFS.

    Plan shape: symmetrized edge list checkpointed once; each layer is
    one equi-join on the frontier's endpoint plus anti-joins against the
    previous layers, all distinct-pair frames. Exact all-pairs-to-3-hops
    is O(|reachable pairs|) — fine on bounded-degree graphs, the known
    blow-up on hub graphs; at 100 TB the production path is the
    HyperBall/HLL-counter family (per-node cardinality sketches merged
    per round — sketch_hll_distinct demonstrates the register algebra),
    trading exactness for linear memory. This query is the exact
    anchor."""
    ev = load_table(spark, sf_dir, "events")
    # shared derivation (operators/eventgraph.py) — same graph as
    # graph_triangles / graph_adamic_adar by construction
    e = deterministic_event_edges(ev).localCheckpoint()
    u = symmetrize(e)
    d1 = u.select(F.col("s").alias("v"), F.col("d").alias("t")).distinct()
    d2 = (
        d1.join(u, d1.t == u.s)
        .select("v", F.col("d").alias("t"))
        .filter(F.col("t") != F.col("v"))
        .distinct()
        .join(d1, ["v", "t"], "left_anti")
    )
    d3 = (
        d2.join(u, d2.t == u.s)
        .select("v", F.col("d").alias("t"))
        .filter(F.col("t") != F.col("v"))
        .distinct()
        .join(d1, ["v", "t"], "left_anti")
        .join(d2, ["v", "t"], "left_anti")
    )
    layers = (
        d1.select("v", F.lit(1).alias("dist"))
        .unionByName(d2.select("v", F.lit(2).alias("dist")))
        .unionByName(d3.select("v", F.lit(3).alias("dist")))
    )
    cnt = layers.groupBy("v").agg(
        F.sum(F.when(F.col("dist") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("dist") == 2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("dist") == 3, 1).otherwise(0)).cast("bigint").alias("n3"),
    )
    return cnt.select(
        F.col("v").alias("user_id"),
        "n1",
        "n2",
        "n3",
        (F.col("n1") * 1000000 + F.col("n2") * 500000 + F.col("n3") * 333333)
        .cast("bigint")
        .alias("harmonic_micro"),
    )
