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

_I64_MAX = (1 << 63) - 1


def _cell_sql(col: str, lo: int, hi: int, width: int) -> str:
    """Cell-index SQL for one range. Integer DIV, not float division:
    (c - lo) can exceed the 2^53 double mantissa on a full bigint
    domain. The subtraction itself overflows int64 outright only when
    lo is deeply negative on a near-full-width domain (round-7 ADVICE
    item) — and we KNOW the exact domain width here (driver-side Python
    bignums), so pay the DECIMAL(38,0) BigDecimal tax per row only in
    that case; every narrower round (including all rounds after the
    first, whose width is <= CELLS^-1 of the domain) rides fast
    codegen'd bigint arithmetic. The DIV result is a cell index
    < CELLS, safely bigint either way."""
    if hi - lo > _I64_MAX:
        return (
            f"CAST((CAST(`{col}` AS DECIMAL(38,0))"
            f" - CAST({lo} AS DECIMAL(38,0))) DIV {width} AS BIGINT)"
        )
    return f"(`{col}` - CAST({lo} AS BIGINT)) DIV {width}"


def kth_smallest_multi(df: DataFrame, col: str, ks_of_n) -> tuple[int, list[int]]:
    """Exact k-th smallest for SEVERAL ks in shared scans — the
    round-11 generalization: a median + p99 query previously ran two
    independent bisections plus a count (≈9 driver-blocking jobs); the
    multi form derives every k from the bounds job's n (``ks_of_n:
    n -> [k, ...]``) and narrows ALL of them from ONE histogram scan
    per round, so the job count is 1 (bounds) + rounds + 1 (final)
    regardless of how many order statistics are requested.

    Correctness hinge: after the ranges diverge they are DISJOINT
    half-open cell intervals (each is a sub-interval of one previous
    cell), so a first-match CASE assigns every row to at most one
    (range, cell) and one groupBy serves every active range; identical
    ranges are deduplicated before the scan. Returns (n, values aligned
    with ks_of_n(n))."""
    bounds = df.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.count(col).alias("n"),
    ).first()
    n = int(bounds["n"])
    ks = list(ks_of_n(n))
    if not ks:
        # Early return BEFORE touching lo/hi: on an empty frame they are
        # None (int(None) raises) and with no ks the scan loop below
        # would build a malformed `CASE END` / `filter(None)` (r11
        # ADVICE). No statistic requested -> nothing to scan.
        return n, []
    for k in ks:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if k > n:
            raise ValueError(f"k={k} exceeds row count {n}")
    glo, ghi = int(bounds["lo"]), int(bounds["hi"])
    # state per requested statistic: [lo, hi, residual k]
    states = [[glo, ghi, k] for k in ks]
    c = F.col(col)
    while any(hi - lo + 1 > CELLS for lo, hi, _ in states):
        # dedupe identical wide ranges -> one scan leg each
        ranges = sorted({(lo, hi) for lo, hi, _ in states if hi - lo + 1 > CELLS})
        widths = {r: -((r[1] - r[0] + 1) // -CELLS) for r in ranges}  # ceil-div
        rid_sql = "CASE " + " ".join(
            f"WHEN `{col}` BETWEEN {lo} AND {hi} THEN {i}"
            for i, (lo, hi) in enumerate(ranges)
        ) + " END"
        cell_sql = "CASE " + " ".join(
            f"WHEN `{col}` BETWEEN {lo} AND {hi}"
            f" THEN {_cell_sql(col, lo, hi, widths[(lo, hi)])}"
            for lo, hi in ranges
        ) + " END"
        cond = None
        for lo, hi in ranges:
            leg = (c >= lo) & (c <= hi)
            cond = leg if cond is None else (cond | leg)
        rows = (
            df.filter(cond)
            .groupBy(F.expr(rid_sql).alias("rid"), F.expr(cell_sql).alias("cell"))
            .count()
            .collect()
        )
        per_range: dict[int, dict[int, int]] = {}
        for r in rows:
            per_range.setdefault(int(r["rid"]), {})[int(r["cell"])] = r["count"]
        for st in states:
            lo, hi, k = st
            if hi - lo + 1 <= CELLS:
                continue
            rid = ranges.index((lo, hi))
            width = widths[(lo, hi)]
            counts = per_range.get(rid, {})
            acc = 0
            for cell in sorted(counts):
                if acc + counts[cell] >= k:
                    st[0] = lo + cell * width
                    st[1] = min(hi, lo + (cell + 1) * width - 1)
                    st[2] = k - acc
                    break
                acc += counts[cell]
            else:  # pragma: no cover - k <= n guarantees a containing cell
                raise AssertionError("selection walk exhausted cells")
    # final exact pass: every remaining range fits in one histogram
    ranges = sorted({(lo, hi) for lo, hi, _ in states})
    rid_sql = "CASE " + " ".join(
        f"WHEN `{col}` BETWEEN {lo} AND {hi} THEN {i}"
        for i, (lo, hi) in enumerate(ranges)
    ) + " END"
    cond = None
    for lo, hi in ranges:
        leg = (c >= lo) & (c <= hi)
        cond = leg if cond is None else (cond | leg)
    rows = (
        df.filter(cond)
        .groupBy(F.expr(rid_sql).alias("rid"), c.alias("v"))
        .count()
        .collect()
    )
    per_range_vals: dict[int, list] = {}
    for r in rows:
        per_range_vals.setdefault(int(r["rid"]), []).append(
            (int(r["v"]), r["count"])
        )
    out = []
    for lo, hi, k in states:
        rid = ranges.index((lo, hi))
        acc = 0
        for v, cnt in sorted(per_range_vals.get(rid, [])):
            acc += cnt
            if acc >= k:
                out.append(v)
                break
        else:  # pragma: no cover
            raise AssertionError("selection walk exhausted values")
    return n, out


def kth_smallest(df: DataFrame, col: str, k: int) -> int:
    """Exact k-th smallest (1-based) of an integer column. Requires
    1 <= k <= count; the caller supplies k (e.g. (n+1)//2 for the lower
    median). Null values must be pre-filtered. Single-statistic wrapper
    over kth_smallest_multi."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return kth_smallest_multi(df, col, lambda n: [k])[1][0]
