"""PageRank as iterative DataFrame joins — the canonical iterative graph
operator (Page et al. 1999), used in corpus curation to weight documents
by link authority before sampling.

Fixed-point INTEGER arithmetic throughout: ranks live in units of
1e-12 (R0 = 10^12 // n), per-edge contributions are integer divisions
(rank DIV out_degree), and the damping update is
    R'(v) = (15 * 10^12) DIV (100 * n)  +  (85 * Σ contrib) DIV 100.
Every operation is exact BIGINT math, so the result is independent of
partitioning, summation order, AND engine — a SQL oracle replays the
same iterations bit-for-bit (plans/graphq.py unrolls them as CTEs).
Dangling-node mass is not redistributed (documented simplification,
mirrored in the oracle).

Scale: each iteration is one join ranks⋈edges on src (co-partitioned on
the same key every iteration — AQE reuses the layout) + one aggregate on
dst; lineage is cut per iteration with localCheckpoint. O(iter) shuffles
of the edge list — the standard distributed PR shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_caic_spark.util import strip_plan_stats

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """edges(src, dst) [distinct, no self-loops] → (v, rank_fp) with
    rank_fp in fixed-point 1e-12 units after `iterations` rounds."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # scalar: needed as an exact literal divisor
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ew = e.join(out_deg, "src").localCheckpoint()
    base = (100 - damping_pct) * SCALE // (100 * n_nodes)
    r0 = SCALE // n_nodes
    ranks = nodes.withColumn("r", F.lit(r0).cast("bigint"))
    for it in range(iterations):
        contrib = (
            ranks.join(ew, ranks["v"] == ew["src"])
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["v"] == contrib["dst"], "left").select(
            "v",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
            ).alias("r"),
        )
        # Cut lineage every few rounds, not every round: localCheckpoint is
        # EAGER (one job per call), and a handful of stacked join stages
        # execute fine as one deep plan. For to-convergence runs (tens of
        # iterations) the cadence keeps planning cost bounded.
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            # strip_plan_stats per the r10 registry convention: the
            # carried stats otherwise scale by the edge-table size at
            # every checkpoint cadence (linear bit growth; squaring-free
            # but unbounded for to-convergence runs).
            ranks = strip_plan_stats(ranks.localCheckpoint())
    return ranks.select("v", F.col("r").alias("rank_fp"))
