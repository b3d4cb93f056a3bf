"""Distributed sorted-neighborhood method (SNM) for record linkage.

The single-machine formulation sorts ALL records by a discriminating
key and compares each record to its next W neighbors — in Spark that is
a global (unpartitioned) window: correct, but single-threaded at the
sort. This operator is the scale formulation:

1. range-partition by the sort key (repartitionByRange — the same
   sampled-boundary partitioner a global sort uses, but WITHOUT the
   single-partition window afterwards), sort within partitions;
2. duplicate the FIRST W rows of every partition into the preceding
   partition (the boundary fix: any W+1 consecutive rows of the global
   order are then fully contained in at least one group);
3. run the lead(1..W) window PER PARTITION GROUP, with original rows as
   the left side only (duplicated rows serve only as lookahead
   targets, so no pair is emitted twice).

The emitted PAIR SET is partition-invariant — it equals the global
window's pair set no matter where the sampled range boundaries land —
which is what makes the operator safe to oracle against the
single-window SQL formulation (tests assert the equality explicitly).
Cost: one range shuffle + one narrow boundary shuffle of P*W rows;
per-group windows parallelize across partitions.
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
    tagged = base.withColumn("_gid", F.spark_partition_id())
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
