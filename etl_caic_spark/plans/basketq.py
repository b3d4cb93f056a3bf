"""Market-basket analysis: pairwise association rules over order
baskets (lineitem x part), the A-priori support/confidence/lift core.

Items are brands (25 distinct) rather than raw part keys so the pair
statistics are dense enough to be meaningful at small SF; the plan shape
is identical for any item granularity. The quadratic step — pairing
items within a basket — is bounded by basket size (max 13 items at any
SF here; the reference TPC-H generator caps baskets at 7 lineitems per
order), so pair generation is O(orders * k^2) with small constant k:
linear in order count at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "basket_assoc_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, p_brand AS item
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), n AS (
      SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_baskets FROM items
    ), supp1 AS (
      SELECT item, CAST(count(*) AS BIGINT) AS supp FROM items GROUP BY 1
    ), pairs AS (
      SELECT a.item AS ante, b.item AS cons, CAST(count(*) AS BIGINT) AS supp_ab
      FROM items a JOIN items b ON a.okey = b.okey AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT ante, cons, supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
           round(supp_ab * 1.0 / sa.supp, 6) AS confidence,
           round(supp_ab * 1.0 * n_baskets / (sa.supp * sb.supp), 6) AS lift
    FROM pairs
    JOIN supp1 sa ON pairs.ante = sa.item
    JOIN supp1 sb ON pairs.cons = sb.item
    CROSS JOIN n
    WHERE supp_ab * 100 >= n_baskets
    """,
    tags=("analytics", "basket"),
)
def basket_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules ante->cons over order baskets with min support
    1% of baskets (exact integer cross-multiplication, no float
    threshold): confidence = supp(ab)/supp(a), lift =
    supp(ab)*N/(supp(a)*supp(b)), each a single deterministic division
    rounded to 6 on both engines.

    Plan: broadcast part dim onto lineitem (25-brand dim at any scale),
    distinct to basket grain (one shuffle on (okey, item)), self-join on
    okey to form pairs — co-partitioned on the same key, so AQE reuses
    the exchange; the pair groupBy partial-aggregates map-side because
    only 300 brand pairs exist. supp1 and N are broadcast-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Four consumers read the basket-item set (totals, per-item support,
    # both pair-join sides); localCheckpoint materializes the
    # join+distinct once instead of four times (measured 2x at sf0.1 —
    # the same shared-subplan pattern as graphq's edge list).
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint()
    )
    n = items.agg(F.count_distinct("okey").cast("bigint").alias("n_baskets"))
    supp1 = items.groupBy("item").agg(F.count("*").cast("bigint").alias("supp"))
    a = items.select(F.col("okey"), F.col("item").alias("ante"))
    b = items.select(F.col("okey"), F.col("item").alias("cons"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("bigint").alias("supp_ab"))
    )
    sa = supp1.select(F.col("item").alias("ante"), F.col("supp").alias("supp_a"))
    sb = supp1.select(F.col("item").alias("cons"), F.col("supp").alias("supp_b"))
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sb), "cons")
        .crossJoin(F.broadcast(n))
        .filter(F.col("supp_ab") * 100 >= F.col("n_baskets"))
        .select(
            "ante",
            "cons",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.round(F.col("supp_ab") * F.lit(1.0) / F.col("supp_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("supp_ab")
                * F.lit(1.0)
                * F.col("n_baskets")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
