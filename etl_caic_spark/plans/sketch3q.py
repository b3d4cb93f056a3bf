"""Round-8 sketch completion: a fully-oracled, engine-deterministic
HyperLogLog.

The repo's approximate-distinct family (agg_approx_distinct's HLL++ via
Spark's built-in, sketch_kmv_distinct, agg_bitmap_distinct) left the
classic HLL itself rows-only, because Spark's implementation hashes with
xxhash and DuckDB's with its own function — the ESTIMATES can't
hash-match. This query instead computes the HLL registers from the
portable md5 draw both engines share, so registers, register sums, and
the final estimate are bit-identical and the whole sketch is oracled —
the same freeze-the-randomness trick as dedup_minhash_md5.

The register sum is kept EXACT: Σ 2^(-M_j) is scaled by 2^53 so each
term 2^(53-M_j) is an integer (M_j ≤ 53), and only the final estimate
performs one float division, immediately rounded. The query emits both
per-group sketches and the '__all__' row obtained by MERGING the
per-group registers with max() — the property that makes HLL the
100-TB distinct-counter (registers combine associatively across
partitions/groups with no re-scan) — plus the exact distinct count per
row, so the sketch's error is auditable in the result itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_B = 8  # register-index bits
_M = 1 << _B  # 256 registers
_WBITS = 52  # remaining hash bits that feed rho

# bit_length(w) as a sum of exact integer comparisons — portable to the
# digit across engines, unlike floor(log2(w)) whose libm rounding can
# flip at 2^k boundaries. 52 comparisons inline; whole-stage codegen
# collapses them into one projection.
_BITLEN_SQL = " + ".join(
    f"CAST(w >= {1 << k} AS INT)" for k in range(_WBITS)
)

_HLL_SQL = f"""
    WITH keys AS (
      SELECT l_returnflag AS grp, l_orderkey AS k FROM lineitem
    ),
    h AS (
      SELECT grp, k,
             CAST(('0x' || substr(md5('hll-v1|' || CAST(k AS VARCHAR)), 1, 15))
                  AS BIGINT) AS v
      FROM keys
    ),
    rho AS (
      SELECT grp,
             v // {1 << _WBITS} AS bucket,
             v % {1 << _WBITS} AS w,
             CAST({_WBITS + 1} - ({_BITLEN_SQL}) AS BIGINT) AS r
      FROM h
    ),
    regs AS (
      SELECT grp, bucket, CAST(max(r) AS BIGINT) AS m_j
      FROM rho GROUP BY 1, 2
    ),
    merged AS (
      SELECT '__all__' AS grp, bucket, CAST(max(m_j) AS BIGINT) AS m_j
      FROM regs GROUP BY 2
    ),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    sums AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS v_filled,
             CAST(sum(1::BIGINT << (53 - m_j)) AS BIGINT) AS s_filled
      FROM allregs GROUP BY 1
    ),
    est AS (
      SELECT grp, v_filled,
             CAST({_M} - v_filled AS BIGINT) AS v_zero,
             CAST(s_filled + ({_M} - v_filled) * (1::BIGINT << 53) AS BIGINT)
               AS s_scaled,
             -- all-double alpha: DuckDB parses bare decimal literals as
             -- DECIMAL, whose division rounds differently from the IEEE
             -- doubles the Spark side computes — force DOUBLE end-to-end
             CAST(round((CAST(0.7213 AS DOUBLE)
                  / (1 + CAST(1.079 AS DOUBLE) / {_M})) * {_M} * {_M}
                  * (1::BIGINT << 53)
                  / (s_filled + ({_M} - v_filled) * (1::BIGINT << 53)))
                  AS BIGINT) AS est_raw
      FROM sums
    ),
    corrected AS (
      SELECT grp, v_zero, s_scaled,
             -- linear-counting ln frozen to 6 decimals before scaling
             -- (micro-nat discipline): raw libm ln can differ by an ulp
             -- between engines and flip round() at a .5 boundary
             CASE WHEN est_raw <= {(5 * _M) // 2} AND v_zero > 0
                  THEN CAST(round(round(ln({_M} * 1.0 / v_zero), 6) * {_M})
                       AS BIGINT)
                  ELSE est_raw END AS est_distinct
      FROM est
    ),
    exact AS (
      SELECT grp, CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
      FROM keys GROUP BY 1
      UNION ALL
      SELECT '__all__', CAST(count(DISTINCT k) AS BIGINT) FROM keys
    )
    SELECT c.grp, c.v_zero, c.s_scaled, c.est_distinct, e.exact_distinct
    FROM corrected c JOIN exact e ON e.grp = c.grp
"""


@register("sketch_hll_distinct", oracle=_HLL_SQL, tags=("sketch", "scale"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count of l_orderkey per
    l_returnflag plus the register-merged '__all__' total (see module
    docstring: portable md5 registers → bit-identical estimates on both
    engines; exact distinct carried alongside for auditability).

    Plan shape (round 11, revised r14): the distinct (grp, key) frame —
    duplicates of a key produce the SAME md5/rho, so registers computed
    over distinct keys are bit-identical while the md5 work shrinks by
    the duplication factor — feeds the sketch leg AND both exact-audit
    legs as three sibling subtrees of ONE job. r11 materialized it with
    localCheckpoint; r14 removed the checkpoint: the blocking barrier
    SERIALIZED the distinct job ahead of the main job (and was the
    query's whole steal exposure — 8.1 s first-runs on a stolen box vs
    1.7-1.9 s barrier-free), while recomputing the cheap narrow distinct
    per sibling pipelines everything into one overlapped job (A/B at
    sf0.1: 1.69 vs 2.04 s warm min, byte-identical output). Registers
    are two map-side-combinable groupBys of at most groups × 256 rows;
    the merge row reuses the per-group registers. At 100 TB you'd drop
    the audit columns entirely and the sketch is one pass + a
    256-row-per-group reduce — the canonical distributed cardinality
    plan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), F.col("l_orderkey").alias("k")
    )
    dk = li.distinct()
    h = dk.select(
        "grp",
        "k",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("hll-v1|"), F.col("k").cast("string"))), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("v"),
    )
    rho = h.select(
        "grp",
        F.expr(f"v div {1 << _WBITS}").alias("bucket"),
        (F.col("v") % (1 << _WBITS)).alias("w"),
    ).select(
        "grp",
        "bucket",
        F.expr(f"CAST({_WBITS + 1} - ({_BITLEN_SQL}) AS BIGINT)").alias("r"),
    )
    regs = rho.groupBy("grp", "bucket").agg(F.max("r").cast("bigint").alias("m_j"))
    merged = regs.groupBy("bucket").agg(
        F.max("m_j").cast("bigint").alias("m_j")
    ).select(F.lit("__all__").alias("grp"), "bucket", "m_j")
    allregs = regs.unionByName(merged)
    sums = allregs.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("v_filled"),
        F.sum(F.expr("shiftleft(1L, 53 - m_j)")).cast("bigint").alias("s_filled"),
    )
    est = sums.select(
        "grp",
        (F.lit(_M) - F.col("v_filled")).cast("bigint").alias("v_zero"),
        (
            F.col("s_filled")
            + (F.lit(_M) - F.col("v_filled")) * F.expr("shiftleft(1L, 53)")
        )
        .cast("bigint")
        .alias("s_scaled"),
    ).select(
        "grp",
        "v_zero",
        "s_scaled",
        F.round(
            F.lit(0.7213 / (1 + 1.079 / _M))
            * F.lit(_M)
            * F.lit(_M)
            * F.expr("shiftleft(1L, 53)")
            / F.col("s_scaled")
        )
        .cast("bigint")
        .alias("est_raw"),
    )
    corrected = est.select(
        "grp",
        "v_zero",
        "s_scaled",
        # linear-counting ln frozen to 6 decimals before scaling by m —
        # same discipline as operators/micronat.py (the argument is a
        # ratio, not an integer, so the shared iln helper doesn't apply,
        # but the freeze-then-scale order is identical on both engines)
        F.when(
            (F.col("est_raw") <= (5 * _M) // 2) & (F.col("v_zero") > 0),
            F.round(
                F.round(F.log(F.lit(_M) / F.col("v_zero")), 6) * _M
            ).cast("bigint"),
        )
        .otherwise(F.col("est_raw"))
        .alias("est_distinct"),
    )
    # audits ride the SAME distinct frame: per-group rows are already
    # distinct (count(*) == count distinct), the __all__ leg dedups the
    # small cross-group key overlap only.
    exact = dk.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("exact_distinct")
    )
    exact_all = dk.agg(
        F.countDistinct("k").cast("bigint").alias("exact_distinct")
    ).select(F.lit("__all__").alias("grp"), "exact_distinct")
    return corrected.join(
        exact.unionByName(exact_all), "grp"
    ).select("grp", "v_zero", "s_scaled", "est_distinct", "exact_distinct")
