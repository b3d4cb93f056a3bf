"""Distributed connected components by star contraction + pointer
doubling — THE shared derivation (consumers: graph_connected_components
plans/wave9c.py, dedup_cluster_canonical plans/wave9d.py,
dedup_semantic_embedding plans/wave11b.py).

Plain hash-min label propagation needs DIAMETER rounds (13 on the
sf0.1 event graph — probed; the classic CC scale trap). This operator
contracts the edge frame by the current labels every round and runs
min-label over the CONTRACTED graph, the star-contraction scheme of
the Shiloach-Vishkin / "Connected Components in MapReduce" family —
and, critically, SHORTCUTS the per-round relabel map to its fixpoint
by pointer doubling before applying it. Without the shortcut a min
step on a path graph moves every label by exactly one hop
(newlabel(v) = v-1), so convergence is linear in the chain length — a
200-node path needs 199 rounds, and duplicate chains A~B~C~... are
exactly the motif dedup clustering exists for. With doubling the
relabel map (rep -> newlabel, strictly DECREASING along pointers, so
an acyclic forest) collapses a length-L chain in ceil(log2 L)
self-compositions: map := map(map) squares the jump distance each
iteration. Every relabel join runs at REPRESENTATIVE scale (the map
has one row per live label, shrinking every round), never edge scale.

Convergence is detected, not assumed: the outer loop stops when the
contracted edge set is empty and the inner loop when no pointer moved
(one-row take(1) per iteration — the same bounded-collect class as
ml_logreg_gd's gradient step). Both caps are backed by geometric
decay (doubling covers 2^64-length chains in 64 jumps; a fully
shortcut min round at least halves the live-component-graph diameter)
and both raise RuntimeError instead of returning silently if ever
exhausted — a wrong-labels return is never an option
(tests/test_prefix_property.py pins a 220-node path against
union-find, the exact regime the unshortcut form could not converge
on). lab/carcs/map localCheckpoint per round — the iterative-plan
lineage discipline shared with graph_hits (plans/wave8c.py).

Every checkpoint here is wrapped in util.strip_plan_stats: checkpoints
carry the origin plan's Catalyst sizeInBytes into the new LogicalRDD,
and the doubling SELF-join then squares that statistic every iteration
— the BigInteger's bit length doubles per jump and Catalyst planning
itself becomes the bottleneck (minutes of driver CPU inside
BigInteger.multiplyToomCook3, found by jstack when the 600k-node chain
probe's rounds grew 2 s -> 84 s on constant-size frames). Stripping
the carried stats pins the estimate at defaultSizeInBytes; AQE still
re-plans every join from true runtime sizes, so execution strategy is
unchanged (probed: identical results, chain rounds back to constant
cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_caic_spark.util import strip_plan_stats

MAX_ROUNDS = 64
MAX_JUMPS = 64


def _ckpt(df: DataFrame) -> DataFrame:
    """localCheckpoint + carried-stats strip (module docstring)."""
    return strip_plan_stats(df.localCheckpoint())


def _shortcut(replab: DataFrame) -> DataFrame:
    """Pointer-double ``rep -> newlabel`` to its fixpoint: afterwards
    every rep points at the root of its pointer tree (newlabel values
    are all self-mapped). Pointers strictly decrease, so the map is an
    acyclic forest and map := map(map) converges in ceil(log2 L)
    iterations for the longest chain L."""
    for _ in range(MAX_JUMPS):
        m2 = replab.select(
            F.col("rep").alias("r2"), F.col("newlabel").alias("nl2")
        )
        jumped = (
            replab.join(m2, replab["newlabel"] == m2["r2"], "left")
            .select(
                "rep",
                F.coalesce("nl2", "newlabel").alias("newlabel"),
                (
                    F.col("nl2").isNotNull()
                    & (F.col("nl2") != F.col("newlabel"))
                ).alias("_moved"),
            )
        )
        jumped = _ckpt(jumped)
        replab = jumped.select("rep", "newlabel")
        if not jumped.where("_moved").take(1):  # fixpoint: all roots
            return replab
    raise RuntimeError(
        f"connected_components: relabel map did not reach fixpoint in "
        f"{MAX_JUMPS} pointer-doubling jumps (covers chains of length "
        f"2^{MAX_JUMPS}) — pointer cycle, which the strictly-decreasing "
        f"min construction should make impossible"
    )


def connected_components_gated(
    edges: DataFrame, driver_edge_cutoff: int = 1_000_000
) -> DataFrame:
    """Size-gated hybrid over ``connected_components`` (r16, the r15
    verdict's ask #7 — the operators/components.py precedent): when the
    raw edge list has at most ``driver_edge_cutoff`` rows (1M pairs ≈
    16 MB of longs, trivially driver-resident), ONE bounded
    ``limit(cutoff+1).collect()`` job feeds a driver union-find and the
    star-contraction loop's per-round fixed cost (per round: a take(1)
    convergence probe, a contraction join chain, plus per-jump
    checkpoint + take(1) inside the pointer-doubling shortcut — a dozen
    serial blocking jobs for a duplicate-clique graph) never runs.
    Above the cutoff — the regime a 100 TB corpus's candidate pairs
    land in — the distributed loop below runs unchanged, and the probe
    cost is one short-circuited scan of cutoff+1 rows. Output identical
    by construction: same (v, component = min reachable id) rows
    (union-find with union-by-min; duplicate/asymmetric edges absorbed).
    ``driver_edge_cutoff=0`` forces the distributed path (tests)."""
    if driver_edge_cutoff > 0:
        probe = (
            edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .limit(driver_edge_cutoff + 1)
            .collect()
        )
        if len(probe) <= driver_edge_cutoff:
            from etl_caic_spark.operators.components import _driver_union_find

            # vtype from the POST-UNION schema: if a/b differ in width
            # the distributed path's label union would widen — the
            # driver path must declare the same type (components.py
            # r13 ADVICE lesson).
            vtype = (
                edges.select(F.col("a").alias("v"))
                .unionByName(edges.select(F.col("b").alias("v")))
                .schema["v"]
                .dataType
            )
            return _driver_union_find(
                probe, edges.sparkSession, vtype
            ).select(F.col("member").alias("v"), "component")
    return connected_components(edges)


def connected_components(edges: DataFrame) -> DataFrame:
    """edges(a, b) undirected, a != b -> (v, component) for every
    endpoint, where component is the MINIMUM node id reachable from v
    (the canonical representative)."""
    lab = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("label"))
    )
    lab = _ckpt(lab)
    carcs = _ckpt(edges.select(F.col("a").alias("s"), F.col("b").alias("d")))
    for _ in range(MAX_ROUNDS):
        if not carcs.take(1):  # fixpoint: no edges between distinct labels
            return lab.select("v", F.col("label").alias("component"))
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
        replab = _shortcut(replab)
        lab = (
            lab.join(replab, lab.label == replab.rep)
            .select("v", F.col("newlabel").alias("label"))
        )
        lab = _ckpt(lab)
        ra = replab.select(F.col("rep").alias("s"), F.col("newlabel").alias("ns"))
        rb = replab.select(F.col("rep").alias("d"), F.col("newlabel").alias("nd"))
        carcs = (
            carcs.join(ra, "s")
            .join(rb, "d")
            .filter(F.col("ns") != F.col("nd"))
            .select(F.col("ns").alias("s"), F.col("nd").alias("d"))
            .distinct()
        )
        carcs = _ckpt(carcs)
    raise RuntimeError(
        f"connected_components: contracted edge frame still non-empty "
        f"after {MAX_ROUNDS} rounds — returning partial labels is never "
        f"an option"
    )
