"""Pointer-jumping hierarchy resolution over an arithmetic parent rule.

``resolve_decimal_trie(keys)`` resolves every key of a decimal-trie
hierarchy (parent(k) = k div 10; keys < 10 are roots) to (root, depth)
in O(log depth) self-joins instead of O(depth) iteration — the
distributed plan for org charts, BOMs and category trees whose parent
relation is computable from the key.

The jump table is built over the CLOSURE of the key set under parent()
(k div 10^i for i = 0..18 covers any int64 key — int64 max has 19
decimal digits, so the deepest node sits at depth 18), so every
intermediate ancestor has a row even when it is not itself in ``keys``
— the
per-round inner join is total on ANY key distribution (sampled slices,
filtered snapshots), not just dense fixtures. Output rows are filtered
back to the original key set. tests/test_wave8b.py exercises the sparse
case directly through this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JUMP_ROUNDS = 5  # covers depth 2^5 = 32 >= 18, the max decimal depth of int64


def resolve_decimal_trie(keys: DataFrame) -> DataFrame:
    """keys(k: bigint) -> (k, root_key, depth) for every input key."""
    nodes = (
        keys.select(
            F.explode(F.array(*[F.expr(f"k div {10**i}") for i in range(19)])).alias(
                "k"
            )
        )
        .distinct()
    )
    f = nodes.select(
        "k",
        F.when(F.col("k") >= 10, F.expr("k div 10")).otherwise(F.col("k")).alias("anc"),
        F.when(F.col("k") >= 10, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("d"),
    )
    for _ in range(JUMP_ROUNDS):
        a, b = f.alias("a"), f.alias("b")
        f = a.join(b, F.col("a.anc") == F.col("b.k")).select(
            F.col("a.k").alias("k"),
            F.col("b.anc").alias("anc"),
            (F.col("a.d") + F.col("b.d")).cast("bigint").alias("d"),
        )
    return f.join(keys, "k").select(
        "k", F.col("anc").alias("root_key"), F.col("d").alias("depth")
    )
