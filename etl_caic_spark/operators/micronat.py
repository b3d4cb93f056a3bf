"""The registry's micro-nat integer logarithm — THE shared definition.

``iln(c) = round(round(ln(c), 6) * 1e6) AS BIGINT``

Freezing ln to 6 decimals BEFORE scaling makes the value an exact
BIGINT that Spark and DuckDB agree on digit-for-digit: libm ln is not
required to be correctly rounded, but both engines' results agree far
past 6 decimals for the integer inputs this registry feeds it (counts,
cents, degrees — never sub-unit values), so the frozen value is
engine-portable. Every "micro-nat" column in the query registry
(tf-idf weights, BLEU/chrF log terms, Theil, WOE, Adamic-Adar, DSIR,
bigram logprobs) must use THIS helper — a local redefinition that
drifts in rounding discipline would silently split the engines.

The SQL twin is the identical text
``CAST(round(round(ln(x), 6) * 1e6) AS BIGINT)`` (see any oracle using
micro-nats). Inputs must be >= 1; ln(0) is NULL on Spark and an ERROR
on DuckDB, so guard zeros at the call site (CASE WHEN, or +1 Laplace).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iln(c: Column | str) -> Column:
    """Micro-nat integer log of an integer-valued column (>= 1)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(F.round(F.log(col), 6) * 1e6).cast("bigint")
