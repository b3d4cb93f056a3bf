"""Round-9 wave C: connected components by distributed star
contraction.

The graph family (pagerank, BFS, SSSP, triangles, k-core, LPA, HITS,
harmonic) was missing THE foundational graph operator. The classic
scale trap is min-label propagation, whose round count is the graph
DIAMETER (13 rounds on the sf0.1 fixture); this implementation instead
contracts the edge set by the current labels every round — min-label
over the CONTRACTED graph — which is the star-contraction scheme
(Shiloach-Vishkin / Kiveris et al. "Connected Components in MapReduce"
family): each round every representative hooks to the minimum of its
contracted neighborhood and the relabel map is then SHORTCUT to its
fixpoint by pointer doubling (map := map(map), representative-scale
joins only), so a min step that would otherwise creep one hop per
round along a label chain collapses it in log rounds instead — a
200-node duplicate chain resolves in one contraction round plus ~8
doubling jumps, where the unshortcut form needed 199 rounds. The
fixture converges in 2 rounds / 3 total jumps at sf0.01 and 4 rounds /
8 jumps at sf0.1 (re-measured after the round-10 doubling shortcut; the
pre-shortcut form needed 3 and 5 rounds, plain propagation 8 and 13).
The contracted edge frame STRICTLY
SHRINKS every round — at 100 TB round 1 is edge-scale, round 2 is
component-representative scale, and the tail rounds are tiny.

Convergence is detected, not assumed: the outer loop stops when the
contracted edge set is empty and the doubling loop when no pointer
moved (one single-row take(1) each — the same bounded-collect class as
ml_logreg_gd's gradient step and AQE's own statistics). Both 64-step
caps are backed by geometric decay and raise RuntimeError rather than
ever returning partial labels (operators/concomp.py; the long-path
regime is pinned by a 220-node chain vs union-find in
tests/test_prefix_property.py).

The graph is the deterministic event graph (operators/eventgraph.py)
additionally sparsified by a residue rule (endpoints must agree mod 7)
so the fixture has real component structure (24 components at sf0.01,
67 at sf0.1) rather than the single giant component of the dense
variant. The oracle is the textbook DECLARATIVE definition — a
recursive transitive closure assigning every node the minimum node id
it can reach — so the hash match certifies true component semantics,
not merely engine parity of an unrolled schedule.

Reference parity: the reference (task.ts:88-189) has no graph surface —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.concomp import connected_components_gated
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_CC_SQL = """
    WITH RECURSIVE e AS (
      SELECT DISTINCT least(user_id, (user_id * 7 + event_id) % 150) AS a,
             greatest(user_id, (user_id * 7 + event_id) % 150) AS b
      FROM events
      WHERE event_id % 37 = 0
        AND user_id <> (user_id * 7 + event_id) % 150
        AND user_id % 7 = ((user_id * 7 + event_id) % 150) % 7
    ),
    arcs AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b AS s, a AS d FROM e),
    walk AS (
      SELECT s AS v, d AS r FROM arcs
      UNION
      SELECT w.v, a.d FROM walk w JOIN arcs a ON a.s = w.r
    )
    SELECT v AS user_id, CAST(least(v, min(r)) AS BIGINT) AS component
    FROM walk GROUP BY v
"""


@register("graph_connected_components", oracle=_CC_SQL, tags=("graph", "iterative", "scale"))
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the residue-sparsified deterministic
    event graph: every node is labeled with the smallest node id in its
    component (module docstring: star contraction, convergence-detected,
    certified against a recursive-transitive-closure oracle).

    Plan per round (operators/concomp.py — the shared star-contraction
    operator, also driving dedup_cluster_canonical): two hash joins
    relabel the contracted edge endpoints, one symmetrized groupBy
    computes each representative's neighborhood minimum, and one join
    folds the new representative labels back onto the node frame;
    lab/carcs localCheckpoint per round (lineage cut — the
    iterative-plan discipline shared with graph_hits, wave8c.py). All
    shuffles are keyed by node/label id.

    r16: size-gated like every other componentization consumer
    (concomp.connected_components_gated — one bounded probe, driver
    union-find below 1M raw edges, the distributed loop above; labels
    identical by construction, pinned by
    tests/test_prefix_property.py). The residue-sparsified fixture
    graph saturates at ~150 nodes at every SF, so at bench scale the
    star-contraction rounds were a dozen serial blocking jobs of pure
    fixed cost; at 100 TB edge counts exceed the gate and the
    distributed loop above runs unchanged."""
    ev = load_table(spark, sf_dir, "events")
    dst = (F.col("user_id") * 7 + F.col("event_id")) % 150
    edges = (
        ev.filter((F.col("event_id") % 37 == 0) & (F.col("user_id") % 7 == dst % 7))
        .select(
            F.least(F.col("user_id"), dst).alias("a"),
            F.greatest(F.col("user_id"), dst).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return connected_components_gated(edges).select(
        F.col("v").alias("user_id"), "component"
    )
