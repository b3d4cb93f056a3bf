"""As-of join: for each left row, attach the latest right row with
right_ts <= left_ts within the same partition keys.

Spark has no native ASOF JOIN (SURVEY.md §2.C joins). The scalable
implementation here is the union + window trick:

  1. tag left rows (side=1) and right rows (side=0) and UNION them;
  2. one window per partition key set, ordered by (ts, side) — right rows
     sort before left rows at equal ts, giving inclusive `<=` semantics
     (matching DuckDB's ASOF JOIN);
  3. last(right_col, ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT
     carries the most recent right values forward;
  4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows on the partition keys + a sort within
partitions — linear, no range cross-product; this is the 100 TB path
(vs. pd.merge_asof per group, which needs the same shuffle but moves the
data through Python). Right side should be unique per (keys, ts) for
deterministic output — pre-aggregate if needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Left as-of join. Returns all left columns plus `right_values` columns
    (null when no right row precedes the left row)."""
    on = list(on)
    right_values = list(right_values)
    ts = "__asof_ts"

    lhs = left.withColumn(ts, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    for c in right_values:
        if c in lhs.columns:
            raise ValueError(f"right value column {c!r} collides with left")
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    rhs = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        *right_values,
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    rhs = rhs.select(*lhs.columns)

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in right_values:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE, ts)
