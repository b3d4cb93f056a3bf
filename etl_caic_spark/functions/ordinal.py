"""Ordinal-scale helpers for the reference's severity semantics (R9,
reference task.ts:116,143-146)."""

from __future__ import annotations

from pyspark.sql import functions as F

# Most-severe-first, as in the reference (task.ts:116).
SEVERITY_ORDER = ["extreme", "high", "considerable", "moderate", "low", "noRating"]


def severity_rank(col):
    """1-based rank on the ordinal scale; unknown strings rank as noRating
    (defined fallback — documented deviation from the reference's undefined
    behavior at task.ts:144-146, see SURVEY.md §2.B.2)."""
    pos = F.array_position(F.array(*[F.lit(s) for s in SEVERITY_ORDER]), col)
    return F.when(pos == 0, F.lit(len(SEVERITY_ORDER))).otherwise(pos)
