"""As-of join: for each left row, attach the latest right row with
right_ts <= left_ts within the same partition keys.

Spark has no native ASOF JOIN (SURVEY.md §2.C joins). The scalable
implementation here is the union + window trick:

  1. tag left rows (side=1) and right rows (side=0) and UNION them;
  2. one window per partition key set, ordered by (ts, side) — right rows
     sort before left rows at equal ts, giving inclusive `<=` semantics
     (matching DuckDB's ASOF JOIN);
  3. the right row's value columns travel as ONE struct, carried forward by
     a single last(ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT
     — atomically, so the filled values always come from the same right row
     (per-column fills would mix rows when a right value column is NULL);
  4. keep only left rows and unpack the struct.

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
    from pyspark.sql.types import StructType

    on = list(on)
    right_values = list(right_values)
    ts = "__asof_ts"
    payload = "__asof_payload"

    for c in right_values:
        if c in left.columns:
            raise ValueError(f"right value column {c!r} collides with left")
    ptype = StructType([right.schema[c] for c in right_values])

    lhs = (
        left.withColumn(ts, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(payload, F.lit(None).cast(ptype))
    )
    # The right row's values ride as one non-null struct — even when every
    # field inside is NULL — so the window fill picks right rows atomically.
    rhs = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        F.struct(*right_values).alias(payload),
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
    filled = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1)
    for c in right_values:
        out = out.withColumn(c, F.col(payload).getField(c))
    return out.drop(_SIDE, ts, payload)
