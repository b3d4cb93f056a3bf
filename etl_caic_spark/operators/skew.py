"""Skew handling: salting (SURVEY.md §7.4.6).

AQE's skew-join split handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in the session factory); salting
is the explicit fallback when one grouping/join key dwarfs the rest —
e.g. the empty-string document hash, the null user, the default tenant.

- salted_groupby_sum: two-phase aggregate — phase 1 groups on
  (key, salt) so the hot key's rows spread over `salt_n` reducers,
  phase 2 merges the partials. Identical results to the direct groupBy
  (tests assert equality); ~2× shuffle rows of the partial aggregates,
  which is noise next to a hot reducer that runs for hours.
- salted_join: replicate the small side `salt_n`× with a salt id and salt
  the big side's key deterministically, turning one hot hash bucket into
  `salt_n` buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: sum(value) by keys, skew-proof.
    Deterministic salt (hash of the whole row's value column + a uniform
    spread via monotonically increasing id would be non-deterministic —
    instead we hash the value itself, which spreads arbitrarily but
    deterministically)."""
    keys = list(keys)
    salt = (F.hash(F.col(value_col)) % salt_n + salt_n) % salt_n
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_partial_sum"), F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_partial_sum").alias(f"sum_{value_col}"),
        F.sum("_partial_n").cast("bigint").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_n: int = 8,
) -> DataFrame:
    """Equi-join where `big` has skewed keys: the small side is replicated
    salt_n times (explode over salt ids), the big side gets a
    deterministic salt in [0, salt_n), and the join key becomes
    (key, salt) — one hot bucket becomes salt_n buckets."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    salted_big = big.withColumn(
        "_salt", (F.hash(F.col(big_key), F.lit(17)) % salt_n + salt_n) % salt_n
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        "inner",
    )
    return joined.drop("_salt")
