"""Distributed connected components by star contraction — THE shared
derivation (consumers: graph_connected_components plans/wave9c.py,
dedup_cluster_canonical plans/wave9d.py).

Plain hash-min label propagation needs DIAMETER rounds (13 on the
sf0.1 event graph — probed; the classic CC scale trap). This operator
instead contracts the edge frame by the current labels every round and
runs min-label over the CONTRACTED graph, the star-contraction scheme
of the Shiloach-Vishkin / "Connected Components in MapReduce" family:
label chains collapse geometrically (5 rounds at sf0.1, 3 at sf0.01 —
probed against plain propagation's 13/8) and the contracted edge frame
STRICTLY SHRINKS — round 1 is edge-scale, round 2 is representative-
scale, the tail rounds are tiny.

Convergence is detected, not assumed: the loop stops when the
contracted edge set is empty (a one-row take(1) per round — the same
bounded-collect class as ml_logreg_gd's gradient step). The 64-round
cap is unreachable by construction (contraction at least halves the
representative count per round, so 64 rounds cover 2^64 nodes); it
bounds the plan, it is not a tuning knob. lab/carcs localCheckpoint per
round — the iterative-plan lineage discipline shared with graph_hits
(plans/wave8c.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 64


def connected_components(edges: DataFrame) -> DataFrame:
    """edges(a, b) undirected, a != b -> (v, component) for every
    endpoint, where component is the MINIMUM node id reachable from v
    (the canonical representative)."""
    lab = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint()
    )
    carcs = edges.select(F.col("a").alias("s"), F.col("b").alias("d")).localCheckpoint()
    for _ in range(MAX_ROUNDS):
        if not carcs.take(1):  # fixpoint: no edges between distinct labels
            break
        sym = carcs.unionAll(
            carcs.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        nbmin = sym.groupBy(F.col("s").alias("rep")).agg(F.min("d").alias("mn"))
        reps = lab.select(F.col("label").alias("rep")).distinct()
        replab = reps.join(nbmin, "rep", "left").select(
            "rep",
            F.least(F.col("rep"), F.coalesce(F.col("mn"), F.col("rep"))).alias(
                "newlabel"
            ),
        )
        lab = (
            lab.join(replab, lab.label == replab.rep)
            .select("v", F.col("newlabel").alias("label"))
            .localCheckpoint()
        )
        ra = replab.select(F.col("rep").alias("s"), F.col("newlabel").alias("ns"))
        rb = replab.select(F.col("rep").alias("d"), F.col("newlabel").alias("nd"))
        carcs = (
            carcs.join(ra, "s")
            .join(rb, "d")
            .filter(F.col("ns") != F.col("nd"))
            .select(F.col("ns").alias("s"), F.col("nd").alias("d"))
            .distinct()
            .localCheckpoint()
        )
    return lab.select("v", F.col("label").alias("component"))
