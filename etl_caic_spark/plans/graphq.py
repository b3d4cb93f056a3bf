"""Graph queries: PageRank over the event-interaction graph.

The edge list is derived deterministically from the events table (user →
previous user within the same event_type stream), so both engines build
the identical graph; the PageRank iterations are exact integer fixed-
point (operators/pagerank.py), so the oracle replays them as unrolled
CTEs and hash-matches bit-for-bit — a fully-oracled ITERATIVE algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.pagerank import SCALE, pagerank
from etl_caic_spark.operators.eventgraph import deterministic_event_edges
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_ITER = 5
_DAMP = 85

_GRAPH_SQL = """
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
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    ew AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
    r0 AS (SELECT v, CAST({scale} // n AS BIGINT) AS r FROM nodes, nn)
"""


def _pagerank_oracle() -> str:
    """Unroll the fixed iteration count as CTE layers r1..rN — exact
    integer replay of operators/pagerank.pagerank."""
    parts = ["WITH" + _GRAPH_SQL.format(scale=SCALE)]
    prev = "r0"
    for i in range(1, _ITER + 1):
        parts.append(f"""
    s{i} AS (
      SELECT ew.dst, CAST(sum(r // deg) AS BIGINT) AS s
      FROM {prev} JOIN ew ON {prev}.v = ew.src
      GROUP BY 1
    ),
    r{i} AS (
      SELECT nodes.v,
             CAST(({100 - _DAMP} * {SCALE}) // (100 * n)
                  + ({_DAMP} * coalesce(s, 0)) // 100 AS BIGINT) AS r
      FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON nodes.v = s{i}.dst
    )""")
        prev = f"r{i}"
    body = ",".join(parts).replace("WITH,", "WITH")
    return (
        body
        + f"""
    SELECT v AS user_id, r AS rank_fp, round(r / 1e12, 9) AS rank
    FROM r{_ITER}
    """
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, d=0.85) over the deterministic event
    interaction graph: edge = previous actor → current actor within each
    event_type stream. Integer fixed-point iterations make the iterative
    algorithm hash-matchable — the oracle unrolls the same 5 rounds as
    CTEs. rank = rank_fp / 1e12 (exact: one double division of a
    <2^53 integer)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
    ranks = pagerank(edges, "src", "dst", iterations=_ITER, damping_pct=_DAMP)
    return ranks.select(
        F.col("v").alias("user_id"),
        F.col("rank_fp"),
        F.round(F.col("rank_fp") / 1e12, 9).alias("rank"),
    )


@register(
    "graph_triangles",
    oracle="""
    WITH e AS (
      SELECT DISTINCT least(user_id, (user_id * 7 + event_id) % 150) AS a,
             greatest(user_id, (user_id * 7 + event_id) % 150) AS b
      FROM events
      WHERE event_id % 37 = 0
        AND user_id <> (user_id * 7 + event_id) % 150
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    m AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY v
    )
    SELECT v, n_triangles FROM m
    """,
    tags=("graph", "join"),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counting — the clustering-coefficient
    numerator (community-structure signal used to weight link graphs in
    curation). Edges are oriented a<b once, so each triangle (x<y<z) is
    enumerated EXACTLY once by the two-hop join e(x,y)⋈e(y,z)⋈e(x,z) —
    no 3!-fold overcount, no post-hoc distinct. Scale shape: two
    equi-joins on vertex keys (shuffle by key, AQE-broadcastable if the
    edge list is small); the classic skew guard at 100 TB orients edges
    by DEGREE (low-degree endpoint first) so hub vertices never build
    quadratic wedge lists — documented here, unneeded at this graph's
    density. The graph is a deterministic sparse derivation from events
    (~1 edge per 37 events)."""
    ev = load_table(spark, sf_dir, "events")
    # shared derivation (operators/eventgraph.py) — same graph as
    # graph_adamic_adar / graph_harmonic_centrality by construction
    e = deterministic_event_edges(ev).localCheckpoint()  # 3 self-join consumers
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    verts = (
        tri.select(F.col("x").alias("v"))
        .unionByName(tri.select(F.col("y").alias("v")))
        .unionByName(tri.select(F.col("z").alias("v")))
    )
    return verts.groupBy("v").agg(F.count("*").alias("n_triangles"))


_BFS_HOPS = 4
_SEED_MOD = 29


def _bfs_oracle() -> str:
    """Unroll the fixed BFS rounds as CTE layers d1..dN — exact integer
    replay of the Spark iteration (min-hop label propagation)."""
    parts = [
        "WITH"
        + _GRAPH_SQL.format(scale=SCALE)
        + f""",
    d0 AS (SELECT v, 0 AS hop FROM nodes WHERE v % {_SEED_MOD} = 0)"""
    ]
    prev = "d0"
    for i in range(1, _BFS_HOPS + 1):
        parts.append(f"""
    d{i} AS (
      SELECT v, min(hop) AS hop FROM (
        SELECT v, hop FROM {prev}
        UNION ALL
        SELECT e.dst AS v, {prev}.hop + 1 AS hop
        FROM {prev} JOIN edges e ON {prev}.v = e.src
      ) GROUP BY v
    )""")
        prev = f"d{i}"
    return (
        ",".join(parts).replace("WITH,", "WITH")
        + f"""
    SELECT v AS user_id, CAST(hop AS INT) AS hops FROM d{_BFS_HOPS}
    """
    )


@register(
    "graph_bfs_hops",
    oracle=_bfs_oracle(),
    tags=("graph", "iterative"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the event-interaction graph: minimum hop
    distance from the seed set (user_id % 29 == 0) within 4 rounds of
    min-label propagation — the reachability primitive under influence /
    contamination-radius analyses. Integer hops make the iterative
    algorithm hash-matchable; the oracle unrolls the same rounds as CTEs.

    Scale: each round is one shuffle (join frontier⨝edges on src, then
    min-combine); the frontier never exceeds |V| because hops only
    shrink, and edges are reused across rounds (cache-worthy on a real
    cluster). Unreached vertices are absent, not NULL-padded."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    dist = nodes.filter(F.col("v") % _SEED_MOD == 0).select(
        "v", F.lit(0).alias("hop")
    )
    for _ in range(_BFS_HOPS):
        grown = dist.join(edges, dist["v"] == edges["src"]).select(
            F.col("dst").alias("v"), (F.col("hop") + 1).alias("hop")
        )
        dist = dist.unionByName(grown).groupBy("v").agg(F.min("hop").alias("hop"))
    return dist.select(
        F.col("v").alias("user_id"), F.col("hop").cast("int").alias("hops")
    )


@register(
    "graph_reciprocity",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ), seq AS (
      SELECT lag(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS src,
             user_id AS dst
      FROM ev
    ), edges AS (
      SELECT DISTINCT src, dst FROM seq
      WHERE src IS NOT NULL AND src <> dst
    )
    SELECT e.src AS user_id,
           CAST(count(*) AS BIGINT) AS out_degree,
           CAST(count(r.src) AS BIGINT) AS n_reciprocal,
           round(count(r.src) * 1.0 / count(*), 6) AS reciprocity
    FROM edges e
    LEFT JOIN edges r ON e.src = r.dst AND e.dst = r.src
    GROUP BY 1
    """,
    tags=("graph",),
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node edge reciprocity over the directed interaction graph
    (same deterministic edge derivation as graph_pagerank above):
    out_degree, reciprocated-edge count (the reverse edge exists), and
    their ratio.

    Plan: the distinct edge list built once, then a self left-join on
    the REVERSED key pair — one shuffle each side on (src,dst) /
    (dst,src); the join output is at most |E| rows (edge keys are
    unique after distinct), so reciprocity is strictly linear in edges.
    Skew note: a celebrity node inflates one join partition; orienting
    the probe by the lower id halves that (the graph_triangles guard) —
    unnecessary here since the join key is the full edge pair, which is
    near-unique by construction.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
    rev = edges.select(F.col("src").alias("r_src"), F.col("dst").alias("r_dst"))
    joined = edges.join(
        rev,
        (F.col("src") == F.col("r_dst")) & (F.col("dst") == F.col("r_src")),
        "left",
    )
    return joined.groupBy(F.col("src").alias("user_id")).agg(
        F.count("*").cast("bigint").alias("out_degree"),
        F.count("r_src").cast("bigint").alias("n_reciprocal"),
        F.round(F.count("r_src") * F.lit(1.0) / F.count("*"), 6).alias(
            "reciprocity"
        ),
    )
