"""Round-8 wave J: weighted median selection.

``agg_weighted_median``: the weighted median of extended price per
return flag, weighted by quantity — the estimator behind
robust-weighted aggregation in curation (e.g. quality-weighted document
statistics). The classic definition: the smallest value v such that the
cumulative weight of all rows <= v reaches half the total weight. With
integer cents and integer deci-quantity weights, the half-total
comparison 2*cum >= tot is EXACT — no float enters the selection, so
ties and boundary rows resolve identically on both engines.

Reference parity: none (task.ts has no aggregate surface beyond the
severity ordinal) — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_WMEDIAN_SQL = """
    WITH rows_w AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_quantity * 10) AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT grp, cents, w,
             CAST(sum(w) OVER (PARTITION BY grp
                               ORDER BY cents, w
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tot,
             CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n_rows
      FROM rows_w
    ),
    hit AS (
      SELECT grp, cents, tot, n_rows,
             row_number() OVER (PARTITION BY grp ORDER BY cents, w) AS rn
      FROM cum
      WHERE 2 * cw >= tot
    )
    SELECT grp, n_rows, tot AS total_weight_deci,
           cents AS weighted_median_cents
    FROM hit WHERE rn = 1
"""


@register("agg_weighted_median", oracle=_WMEDIAN_SQL, tags=("agg", "stats"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of l_extendedprice (integer cents) per return
    flag, weighted by l_quantity (integer deci-units): the smallest
    value whose cumulative weight reaches half the group total, decided
    by the exact integer predicate 2*cum >= tot over a deterministic
    (cents, w) order.

    Plan shape: one scan -> one hash-partitioned window (grp) carrying
    the cumulative sum, running total and count in a single sort -> the
    2*cum >= tot filter -> a WindowGroupLimit-able rank-1 pick. Groups
    partition the sort, so at 100 TB this is the standard windowed-agg
    shuffle; for a SINGLE global group use the selection-by-bisection
    driver (operators/selection.py, agg_median_selection) instead of a
    window — same answer, O(log range) scans, no global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.round(F.col("l_quantity") * 10).cast("bigint").alias("w"),
    )
    wg = Window.partitionBy("grp")
    wo = wg.orderBy("cents", "w")
    cum = li.select(
        "grp",
        "cents",
        "w",
        F.sum("w").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cw"),
        F.sum("w").over(wg).cast("bigint").alias("tot"),
        F.count("*").over(wg).cast("bigint").alias("n_rows"),
    )
    hit = cum.filter(2 * F.col("cw") >= F.col("tot")).select(
        "grp",
        "cents",
        "tot",
        "n_rows",
        F.row_number().over(Window.partitionBy("grp").orderBy("cents", "w")).alias("rn"),
    )
    return hit.filter(F.col("rn") == 1).select(
        "grp",
        "n_rows",
        F.col("tot").alias("total_weight_deci"),
        F.col("cents").alias("weighted_median_cents"),
    )
