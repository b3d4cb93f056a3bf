"""Connected components over near-duplicate pairs — turns pairwise
near-dup evidence into dedup GROUPS (every transitive cluster keeps one
representative), the step after minhash/jaccard in a real corpus dedup.

Iterative min-label propagation as pure DataFrame joins:
  label(v) ← min(label(v), min over neighbors u of label(u))
until fixpoint. Each iteration is one join + aggregate (shuffle on the
vertex id); lineage is cut with localCheckpoint every iteration so the
plan doesn't grow exponentially. Iterations needed = graph diameter
(near-dup clusters are tiny — bounded by max_iter as a guard).

At 100 TB this is the standard large-star/small-star regime; the simple
propagation suffices because near-dup components are shallow (chains are
rare, cliques common)."""

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
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["v"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # Carry the pre-update label through the projection so convergence
        # is a filter on the already-checkpointed result — no extra
        # old-vs-new join (one fewer shuffle per iteration).
        updated = (
            labels.join(neighbor_min, labels["v"] == neighbor_min["src"], "left")
            .select(
                "v",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.filter(F.col("_old") != F.col("component")).limit(1).count()
        )
        labels = updated.select("v", "component")
        if changed == 0:
            break
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
