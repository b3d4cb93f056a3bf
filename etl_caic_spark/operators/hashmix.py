"""One-hash-per-row replicate mixer for the resampling family.

stat_bootstrap_ci (round6c.py) and stat_permutation_test (round6d.py)
— both migrated as of round 8 — originally hashed every row once PER
replicate (rows x 20 md5 calls — 6% of the whole bench). The
replicate dimension doesn't need fresh entropy per draw: md5 yields 128
bits, three 32-bit words of which seed a rotate-XOR mixer

    hv_r = w1 XOR rot32(w2, s1_r) XOR rot32(w3, s2_r)

with per-replicate rotation constants s1_r = (5r+1) mod 32,
s2_r = (11r+17) mod 32. Each hv_r is exactly uniform on [0, 2^32) (XOR
of independent uniform words; rotation is a bijection), and distinct
replicates read distinct rotation pairs, so draws are pairwise
decorrelated — not cryptographically independent, the documented price
of one-hash-per-row. A production cluster deployment would swap in a
counter-based RNG (Philox/Threefry) UDF; this mixer is the portable
twin both engines can evaluate bit-identically in pure SQL.

Every operation stays in 64-bit-safe integer range: rot32 masks to the
low 32-s bits before shifting left, so no intermediate exceeds 2^32.

The SQL twins (md5_words_sql / mix_sql) are the DuckDB-side mirror;
oracles may inline the rotation with s1/s2 as CTE columns instead of
calling mix_sql per replicate — tests/test_hashmix.py pins the two
forms to bit-identical draws either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rot_consts(r: int) -> tuple[int, int]:
    """Per-replicate rotation amounts (s1, s2)."""
    return (5 * r + 1) % 32, (11 * r + 17) % 32


def md5_words(col: Column, salt: str) -> tuple[Column, Column, Column]:
    """Three 32-bit words from one salted md5 (Spark side).

    NOTE (r15): the three returned expressions each embed their own
    md5() call, and neither CollapseProject nor codegen subexpression
    elimination dedupes them once they are aliased in one projection —
    the digest is computed 3x per row (measured: bootstrap agg pass
    3.48 -> 2.84 s warm at sf0.1 with the digest materialized once).
    Prefer with_md5_words() on a DataFrame hot path; this expression
    form remains for contexts that cannot add a projection."""
    h = F.md5(F.concat(F.lit(salt + "|"), col))
    return tuple(
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
        for i in range(3)
    )


def with_md5_words(df, col: Column, salt: str, keep: list[str]):
    """``df`` -> (keep..., w1, w2, w3) with the salted digest
    materialized as a REAL column in its own projection first, so the
    md5 runs exactly once per row. The two-select shape survives the
    optimizer because the alias is referenced 3x (CollapseProject
    declines to merge — the same law as the round-15 HOF-invariant
    find). Word values are bit-identical to md5_words().

    Output contract: the result carries exactly keep... + w1, w2, w3
    (``_h`` is internal). ``keep`` must not collide with those names —
    a caller whose frame already had a w1/w2/w3/_h would otherwise get
    silent duplicate/ambiguous columns (r15 ADVICE item 3)."""
    reserved = {"_h", "w1", "w2", "w3"} & set(keep)
    if reserved:
        raise ValueError(
            f"with_md5_words: keep columns {sorted(reserved)} collide "
            "with the reserved output names (_h, w1..w3)"
        )
    h = df.select(
        *keep, F.md5(F.concat(F.lit(salt + "|"), col)).alias("_h")
    )
    return h.select(
        *keep,
        *[
            F.conv(F.substring("_h", 1 + 8 * i, 8), 16, 10)
            .cast("bigint")
            .alias(f"w{i + 1}")
            for i in range(3)
        ],
    )


def _rot32(w: Column, s: int) -> Column:
    if s == 0:
        return w
    return F.shiftleft(w.bitwiseAND(F.lit((1 << (32 - s)) - 1)), s) + F.shiftright(
        w, 32 - s
    )


def mix(w1: Column, w2: Column, w3: Column, r: int) -> Column:
    """Replicate-r 32-bit draw from the three md5 words (Spark side)."""
    s1, s2 = rot_consts(r)
    return w1.bitwiseXOR(_rot32(w2, s1)).bitwiseXOR(_rot32(w3, s2))


def md5_words_sql(expr: str, salt: str) -> str:
    """DuckDB CTE columns w1, w2, w3 from one salted md5 of ``expr``."""
    h = f"md5('{salt}|' || {expr})"
    return ", ".join(
        f"CAST(('0x' || substr({h}, {1 + 8 * i}, 8)) AS BIGINT) AS w{i + 1}"
        for i in range(3)
    )


def _rot32_sql(w: str, s: int) -> str:
    if s == 0:
        return w
    return f"((({w} & {(1 << (32 - s)) - 1}) << {s}) + ({w} >> {32 - s}))"


def mix_sql(r: int) -> str:
    """DuckDB expression for the replicate-r draw over columns w1/w2/w3."""
    s1, s2 = rot_consts(r)
    return f"xor(xor(w1, {_rot32_sql('w2', s1)}), {_rot32_sql('w3', s2)})"
