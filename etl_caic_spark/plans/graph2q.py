"""Wave 23 (round 5): second-order graph analytics — common-neighbor /
Jaccard link prediction and per-node local clustering coefficient —
over the same deterministic event-interaction graph as graphq.py (user →
previous user in the event_type stream), so both engines construct the
identical edge list and every metric is integer-exact.

Scale strategy: both queries are built on the UNDIRECTED deduped edge
list with an explicit DEGREE CAP that drops hub nodes before the
quadratic wedge join — the standard trick (e.g. in production
people-you-may-know pipelines) that bounds the two-path blowup at
deg_cap² per node instead of unbounded hub fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_DEG_CAP = 60

# Undirected, deduplicated, capped neighbor list shared by both queries.
_UND_SQL = f"""
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
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM seq WHERE src IS NOT NULL AND src <> dst
    ),
    nbr_all AS (
      SELECT a AS v, b AS w FROM und UNION ALL SELECT b, a FROM und
    ),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
            FROM nbr_all GROUP BY 1),
    nbr AS (
      SELECT n.v, n.w FROM nbr_all n
      JOIN deg dv ON dv.v = n.v AND dv.deg <= {_DEG_CAP}
      JOIN deg dw ON dw.v = n.w AND dw.deg <= {_DEG_CAP}
    )
"""


def _build_und(spark: SparkSession, sf_dir: str):
    """Spark twin of _UND_SQL: (nbr, deg) DataFrames."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    und = (
        seq.where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    nbr_all = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    deg = nbr_all.groupBy("v").agg(F.count("*").cast("bigint").alias("deg"))
    kept = deg.where(F.col("deg") <= _DEG_CAP)
    nbr = (
        nbr_all.join(kept.select("v"), "v")
        .join(
            kept.select(F.col("v").alias("w")),
            "w",
        )
        .select("v", "w")
    )
    return nbr, deg


@register(
    "graph_jaccard_links",
    oracle=f"""
    WITH {_UND_SQL},
    pairs AS (
      SELECT n1.w AS a, n2.w AS b, CAST(count(*) AS BIGINT) AS common
      FROM nbr n1 JOIN nbr n2 ON n1.v = n2.v AND n1.w < n2.w
      GROUP BY 1, 2
    ),
    existing AS (SELECT a, b FROM und)
    SELECT p.a, p.b, p.common,
           CAST(da.deg AS BIGINT) AS deg_a,
           CAST(db.deg AS BIGINT) AS deg_b,
           round(p.common * 1.0 / (da.deg + db.deg - p.common), 6) AS jaccard
    FROM pairs p
    JOIN deg da ON da.v = p.a
    JOIN deg db ON db.v = p.b
    LEFT JOIN existing e ON e.a = p.a AND e.b = p.b
    WHERE e.a IS NULL AND p.common >= 2
    """,
    tags=("graph", "join"),
)
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard: for every NON-adjacent
    node pair sharing ≥2 common neighbors, score
    |N(a)∩N(b)| / (deg(a)+deg(b)−|∩|) — the classic
    people-you-may-know / related-entities primitive. The intersection
    comes from the wedge self-join (two-path enumeration, never a
    node×node cross product), existing edges are anti-joined out, and
    the Jaccard is one division of exact BIGINTs.

    Scale: the wedge join is the canonical quadratic risk — bounded
    here by (a) dropping hub nodes above the degree cap BEFORE the
    join (deg ≤ {_DEG_CAP}; production PYMK does exactly this) and (b)
    grouping map-side on (a,b). Cost is Σ_v deg(v)² over capped
    degrees; the shuffles are all key-partitioned. At 100 TB add
    minhash-of-neighbors prefiltering (operators/dedup.py shape) to
    cut candidate pairs further — same plan skeleton."""
    nbr, deg = _build_und(spark, sf_dir)
    n2 = nbr.select(F.col("v"), F.col("w").alias("w2"))
    pairs = (
        nbr.join(n2, "v")
        .where(F.col("w") < F.col("w2"))
        .groupBy(F.col("w").alias("a"), F.col("w2").alias("b"))
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    existing = (
        seq.where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    out = (
        pairs.join(existing, ["a", "b"], "left_anti")
        .where(F.col("common") >= 2)
        .join(deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")), "b")
    )
    return out.select(
        "a",
        "b",
        "common",
        F.col("deg_a").cast("bigint").alias("deg_a"),
        F.col("deg_b").cast("bigint").alias("deg_b"),
        F.round(
            F.col("common")
            * 1.0
            / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
            6,
        ).alias("jaccard"),
    )


@register(
    "graph_clustering_coeff",
    oracle=f"""
    WITH {_UND_SQL},
    capped_und AS (SELECT v AS a, w AS b FROM nbr WHERE v < w),
    tri AS (
      SELECT n1.w AS a, n2.w AS b, n1.v AS apex
      FROM nbr n1 JOIN nbr n2 ON n1.v = n2.v AND n1.w < n2.w
    ),
    closed AS (
      SELECT t.apex AS v, CAST(count(*) AS BIGINT) AS tri_cnt
      FROM tri t JOIN capped_und e ON e.a = t.a AND e.b = t.b
      GROUP BY 1
    ),
    capdeg AS (SELECT v, CAST(count(*) AS BIGINT) AS cdeg
               FROM nbr GROUP BY 1)
    SELECT d.v AS user_id, d.cdeg AS degree,
           CAST(coalesce(c.tri_cnt, 0) AS BIGINT) AS triangles,
           round(2.0 * coalesce(c.tri_cnt, 0) / (d.cdeg * (d.cdeg - 1)), 6)
             AS clustering
    FROM capdeg d LEFT JOIN closed c ON c.v = d.v
    WHERE d.cdeg >= 2
    """,
    tags=("graph", "join"),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient (how many of my neighbors
    know each other): wedges centered at each node are enumerated by
    the same two-path join as graph_jaccard_links, closed wedges are
    found by joining the wedge's endpoints against the edge list, and
    clustering = 2·triangles / (deg·(deg−1)) — one rounded division of
    exact integers. Complements graph_triangles (global count) with
    the node-level distribution used for community/bot detection.

    Scale: identical wedge-join cost envelope as the Jaccard query
    (degree-capped, Σ deg²); the closure probe joins wedges to edges
    on the (a,b) key both sides shuffle on. Nodes with capped degree
    < 2 are excluded (coefficient undefined)."""
    nbr, _deg = _build_und(spark, sf_dir)
    capped_und = nbr.where(F.col("v") < F.col("w")).select(
        F.col("v").alias("a"), F.col("w").alias("b")
    )
    n2 = nbr.select(F.col("v"), F.col("w").alias("w2"))
    tri = (
        nbr.join(n2, "v")
        .where(F.col("w") < F.col("w2"))
        .select(F.col("w").alias("a"), F.col("w2").alias("b"), F.col("v").alias("apex"))
    )
    closed = (
        tri.join(capped_und, ["a", "b"])
        .groupBy(F.col("apex").alias("v"))
        .agg(F.count("*").cast("bigint").alias("tri_cnt"))
    )
    capdeg = nbr.groupBy("v").agg(F.count("*").cast("bigint").alias("cdeg"))
    out = capdeg.join(closed, "v", "left").where(F.col("cdeg") >= 2)
    return out.select(
        F.col("v").alias("user_id"),
        F.col("cdeg").alias("degree"),
        F.coalesce("tri_cnt", F.lit(0)).cast("bigint").alias("triangles"),
        F.round(
            2.0
            * F.coalesce("tri_cnt", F.lit(0))
            / (F.col("cdeg") * (F.col("cdeg") - 1)),
            6,
        ).alias("clustering"),
    )
