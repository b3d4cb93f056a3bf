"""Distributed exact k-th-smallest selection — order statistics with NO
global sort, NO window, and NO row-scale shuffle at all.

The classic scale trap for an exact median/p99 is `ORDER BY x LIMIT 1
OFFSET k-1` (a full global sort) or a global rank window (a single-task
sort). This operator finds the exact k-th smallest of an integer column
by histogram bisection instead:

1. one aggregate for (min, max, count) — map-side partial, 1 row out;
2. per round: bucket the in-range values into <= CELLS equal-width
   cells, aggregate counts per cell (map-side partial again; at most
   CELLS rows cross the wire), walk the cumulative on the driver to
   find the cell containing the k-th element, and narrow [lo, hi] to
   that cell, rebasing k;
3. stop when the range fits in one histogram (<= CELLS distinct
   values): the final per-value count pass reads the answer exactly.

Rounds are bounded by ceil(log_CELLS(range)) — at 4096 cells a full
64-bit domain needs <= 6 rounds; each round is a single scan with a
PUSHED-DOWN range filter (the parquet reader skips row groups whose
min/max stats fall outside [lo, hi], so later rounds read less data).
Every driver-side collect is <= CELLS rows — the same bounded-collect
class as AQE's partition statistics. This is the selection algorithm a
1000-executor cluster would run for exact percentiles on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELLS = 4096


def kth_smallest(df: DataFrame, col: str, k: int) -> int:
    """Exact k-th smallest (1-based) of an integer column. Requires
    1 <= k <= count; the caller supplies k (e.g. (n+1)//2 for the lower
    median). Null values must be pre-filtered."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bounds = df.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.count(col).alias("n"),
    ).first()
    lo, hi, n = int(bounds["lo"]), int(bounds["hi"]), int(bounds["n"])
    if k > n:
        raise ValueError(f"k={k} exceeds row count {n}")
    c = F.col(col)
    _I64_MAX = (1 << 63) - 1
    while hi - lo + 1 > CELLS:
        width = -((hi - lo + 1) // -CELLS)  # ceil-div
        # integer DIV, not float division: (c - lo) can exceed the
        # 2^53 double mantissa on a full bigint domain. The subtraction
        # itself overflows int64 outright only when lo is deeply
        # negative on a near-full-width domain (round-7 ADVICE item) —
        # and we KNOW the exact domain width here (driver-side Python
        # bignums), so pay the DECIMAL(38,0) BigDecimal tax per row
        # only in that case; every narrower round (including all rounds
        # after the first, whose width is <= CELLS^-1 of the domain)
        # rides fast codegen'd bigint arithmetic. The DIV result is a
        # cell index < CELLS, safely bigint either way.
        if hi - lo > _I64_MAX:
            cell_expr = F.expr(
                f"CAST((CAST(`{col}` AS DECIMAL(38,0))"
                f" - CAST({lo} AS DECIMAL(38,0))) DIV {width} AS BIGINT)"
            )
        else:
            cell_expr = F.expr(f"(`{col}` - CAST({lo} AS BIGINT)) DIV {width}")
        cells = (
            df.filter((c >= lo) & (c <= hi))
            .groupBy(cell_expr.alias("cell"))
            .count()
            .collect()
        )
        counts = {int(r["cell"]): r["count"] for r in cells}
        acc = 0
        for cell in sorted(counts):
            if acc + counts[cell] >= k:
                k -= acc
                lo, hi = lo + cell * width, min(hi, lo + (cell + 1) * width - 1)
                break
            acc += counts[cell]
        else:  # pragma: no cover - k <= n guarantees a containing cell
            raise AssertionError("selection walk exhausted cells")
    vals = (
        df.filter((c >= lo) & (c <= hi)).groupBy(c.alias("v")).count().collect()
    )
    acc = 0
    for r in sorted(vals, key=lambda r: int(r["v"])):
        acc += r["count"]
        if acc >= k:
            return int(r["v"])
    raise AssertionError("selection walk exhausted values")  # pragma: no cover
