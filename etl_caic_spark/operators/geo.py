"""Grid-binned spatial neighbor join.

The scale pattern behind "find all point pairs within distance eps":
instead of the O(n²) cross join, snap each point to an eps-sized grid
cell and equi-join on cell ids — a pair within L∞ distance eps can only
sit in the same or an adjacent cell, so probing the 3x3 neighborhood
(one side exploded by the 9 offsets) finds every candidate exactly once,
and the exact predicate then verifies. Work becomes O(n · density)
shuffled on cell keys; the explode is a constant 9x on ONE side only.

This is the same band-then-verify shape as MinHash-LSH (operators/
dedup.py) applied to metric space — reference parity: the reference has
no spatial operator (its geometry handling is the CAIC explode,
/root/reference/task.ts:151-170); this is part of the training-data
extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _offsets():
    """3x3 neighborhood offsets as a literal array<struct<dx,dy>> —
    explodes inside codegen, no extra source or join. Built lazily:
    Column construction needs an active SparkContext."""
    return F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )


def grid_neighbor_pairs(
    points: DataFrame, id_col: str, x_col: str, y_col: str, eps: float
) -> DataFrame:
    """All unordered pairs with |x_a-x_b| <= eps AND |y_a-y_b| <= eps.

    ``points`` must carry a unique numeric ``id_col``; returns
    (id_a, id_b, d_inf) with id_a < id_b, each pair exactly once: the
    right point lives in exactly one cell and the left side probes each
    neighbor cell exactly once, so the equi-join cannot duplicate.

    Scale: shuffle keys are (cell_x, cell_y); a uniform corpus gives
    O(density) rows per key. Hot cells (skewed data) are AQE-skew-join
    splittable because the verify predicate is a post-join filter, and
    eps controls cell occupancy directly.
    """
    cx = F.floor(F.col(x_col) / eps).alias("cell_x")
    cy = F.floor(F.col(y_col) / eps).alias("cell_y")
    cells = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        cx,
        cy,
    )
    left = (
        cells.select("*", F.explode(_offsets()).alias("o"))
        .select(
            F.col("pid").alias("id_a"),
            F.col("px").alias("xa"),
            F.col("py").alias("ya"),
            (F.col("cell_x") + F.col("o.dx")).alias("probe_x"),
            (F.col("cell_y") + F.col("o.dy")).alias("probe_y"),
        )
    )
    right = cells.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.col("cell_x").alias("probe_x"),
        F.col("cell_y").alias("probe_y"),
    )
    return (
        left.join(right, ["probe_x", "probe_y"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("xa") - F.col("xb")) <= eps)
            & (F.abs(F.col("ya") - F.col("yb")) <= eps)
        )
        .select(
            "id_a",
            "id_b",
            F.greatest(
                F.abs(F.col("xa") - F.col("xb")), F.abs(F.col("ya") - F.col("yb"))
            ).alias("d_inf"),
        )
    )
