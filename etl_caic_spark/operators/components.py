"""Connected components over near-duplicate pairs — turns pairwise
near-dup evidence into dedup GROUPS (every transitive cluster keeps one
representative), the step after minhash/jaccard in a real corpus dedup.

Iterative min-label propagation as pure DataFrame joins:
  label(v) ← min(label(v), min over neighbors u of label(u))
followed by one pointer-jumping shortcut per iteration
  label(v) ← label(label(v))
until fixpoint. Each iteration is one join + aggregate + one shortcut
join (shuffles on the vertex id); lineage is cut with localCheckpoint
every iteration so the plan doesn't grow exponentially. The shortcut
halves the remaining chain depth each pass, so iterations needed are
O(log diameter), not O(diameter) — a 10-iteration budget covers chains
of length ~2^10. Hitting max_iter without a fixpoint raises instead of
silently returning partial labels.

At 100 TB this is the standard large-star/small-star regime; near-dup
components are shallow (chains are rare, cliques common), so the typical
run converges in 2-3 iterations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """pairs(left, right) → (member, component) where component is the
    minimum vertex id in the connected component."""
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["v"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # Carry the pre-update label through the projection so convergence
        # is a filter on the already-checkpointed result — no extra
        # old-vs-new join (one fewer shuffle per iteration).
        propagated = labels.join(
            neighbor_min, labels["v"] == neighbor_min["src"], "left"
        ).select(
            "v",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # Pointer-jumping shortcut: component ← component(component). Every
        # label IS a vertex id, so the self-lookup resolves; the left join
        # + coalesce keeps roots (label == self) untouched.
        parents = propagated.select(
            F.col("v").alias("_p_v"), F.col("component").alias("_p_comp")
        )
        updated = (
            propagated.join(
                parents, propagated["component"] == parents["_p_v"], "left"
            )
            .select(
                "v",
                "_old",
                F.coalesce("_p_comp", "component").alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.filter(F.col("_old") != F.col("component")).limit(1).count()
        )
        labels = updated.select("v", "component")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter > 2^max_iter?); raise max_iter"
        )
    return labels.select(F.col("v").alias("member"), "component")


def dedup_groups(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Keep one representative (the min id) per connected near-dup
    component; singletons keep themselves."""
    comp = connected_components(pairs)
    joined = df.join(comp, df[id_col] == comp["member"], "left")
    return joined.select(
        df[id_col],
        F.coalesce("component", df[id_col]).alias("group_id"),
    ).withColumn("is_representative", F.col(id_col) == F.col("group_id"))
