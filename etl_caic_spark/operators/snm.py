"""Distributed sorted-neighborhood method (SNM) for record linkage.

The single-machine formulation sorts ALL records by a discriminating
key and compares each record to its next W neighbors — in Spark that is
a global (unpartitioned) window: correct, but single-threaded at the
sort. This operator is the scale formulation:

1. range-partition by the sort key (repartitionByRange — the same
   sampled-boundary partitioner a global sort uses, but WITHOUT the
   single-partition window afterwards), sort within partitions;
2. coalesce adjacent UNDERFILLED partitions: one tiny count-by-partition
   aggregate (<= P rows to the driver) drives a greedy remap of adjacent
   partition ids so every resulting group holds >= W rows. Without this,
   one-deep boundary duplication is insufficient — a row near the tail
   of group p whose W lookahead neighbors spill past a sub-W group p+1
   into p+2 would silently lose pairs (skewed sampled boundaries, small
   inputs, or num_partitions near N/W all trigger it);
3. duplicate the FIRST W rows of every group into the preceding group
   (with every group >= W rows, those W rows are exactly the W global
   successors of the previous group's tail, so one-deep duplication is
   provably sufficient: any W+1 consecutive rows of the global order are
   fully contained in at least one group);
4. run the lead(1..W) window PER GROUP, with original rows as the left
   side only (duplicated rows serve only as lookahead targets, so no
   pair is emitted twice).

The emitted PAIR SET is partition-invariant — it equals the global
window's pair set no matter where the sampled range boundaries land —
which is what makes the operator safe to oracle against the
single-window SQL formulation (tests assert the equality explicitly,
including a W > rows-per-partition stress config).
Cost: one range shuffle + one O(P)-row count collect + one narrow
boundary shuffle of G*W rows; per-group windows parallelize across
groups. The localCheckpoint pins the sampled range boundaries so the
count pass and the pair pass see the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_cols: list[str],
    sort_col: str,
    w: int = 3,
    num_partitions: int = 8,
) -> DataFrame:
    """(key_cols..., sort_col) records -> candidate pairs (a_*, b_*)
    within W positions of the global sort_col order (ties broken by the
    first key col, which must be unique)."""
    tie = key_cols[0]
    base = df.select(*key_cols, sort_col).repartitionByRange(
        num_partitions, F.col(sort_col), F.col(tie)
    )
    # Pin the sampled range boundaries: the count pass below and the pair
    # pass must observe the SAME physical partitioning.
    tagged = base.withColumn("_gid", F.spark_partition_id()).localCheckpoint()
    # Greedy-coalesce adjacent partitions so every group has >= W rows
    # (bounded collect: at most num_partitions rows).
    counts = {
        r["_gid"]: r["count"] for r in tagged.groupBy("_gid").count().collect()
    }
    mapping: dict[int, int] = {}
    new_gid, acc = 0, 0
    for gid in range(num_partitions):
        mapping[gid] = new_gid
        acc += counts.get(gid, 0)
        if acc >= w:
            new_gid, acc = new_gid + 1, 0
    if acc and new_gid > 0:  # sub-W tail group merges backwards
        mapping = {g: min(m, new_gid - 1) for g, m in mapping.items()}
    if any(mapping[g] != g for g in mapping):
        remap = F.create_map(
            *[F.lit(x) for g, m in mapping.items() for x in (g, m)]
        )
        tagged = tagged.withColumn("_gid", remap[F.col("_gid")])
    head_w = Window.partitionBy("_gid").orderBy(sort_col, tie)
    ranked = tagged.withColumn("_rn", F.row_number().over(head_w))
    # First W rows of each partition also visit the previous partition,
    # as lookahead-only rows.
    dup = (
        ranked.filter((F.col("_rn") <= w) & (F.col("_gid") > 0))
        .withColumn("_gid", F.col("_gid") - 1)
        .withColumn("_orig", F.lit(False))
    )
    merged = ranked.withColumn("_orig", F.lit(True)).unionByName(dup).drop("_rn")
    lead_w = Window.partitionBy("_gid").orderBy(sort_col, tie)
    cols = []
    for i in range(1, w + 1):
        for kc in key_cols:
            cols.append(F.lead(kc, i).over(lead_w).alias(f"_b_{kc}_{i}"))
        cols.append(F.lead("_orig", i).over(lead_w).alias(f"_b_orig_{i}"))
    wide = merged.select(*key_cols, sort_col, "_orig", *cols)
    out = None
    for i in range(1, w + 1):
        sel = wide.filter(
            F.col("_orig") & F.col(f"_b_{tie}_{i}").isNotNull()
        ).select(
            *[F.col(kc).alias(f"a_{kc}") for kc in key_cols],
            *[F.col(f"_b_{kc}_{i}").alias(f"b_{kc}") for kc in key_cols],
        )
        out = sel if out is None else out.unionByName(sel)
    # Every 'a' row is original and originals live in exactly one group,
    # so each (a, b) pair is emitted exactly once; distinct() is a cheap
    # belt-and-suspenders against future edits, not a dedup requirement.
    return out.distinct()
