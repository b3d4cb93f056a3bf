"""Wave 26b (round 5): surrogate-key generation (deterministic
namespaced UUIDs — the warehouse key-minting primitive) and multi-
distinct aggregation with per-measure filters (one pass, several
COUNT(DISTINCT …) FILTER measures — the dashboard staple).

Exactness: UUIDs are pure md5 string surgery (bit-identical on both
engines); distinct counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


def _uuid5ish(prefix: str, key: Column) -> Column:
    """Deterministic UUID-shaped surrogate key from md5(namespace:key):
    8-4-4-4-12 grouping with the version nibble forced to '5' and the
    variant nibble to 'a' — RFC-4122-shaped (not byte-for-byte RFC
    UUIDv5, which hashes the binary namespace; the shape and the
    determinism are what a warehouse key needs)."""
    h = F.md5(F.concat(F.lit(prefix + ":"), key.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(F.lit("a"), F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


@register(
    "fn_uuid_surrogate",
    oracle="""
    WITH h AS (
      SELECT o_orderkey,
             md5('ord:' || CAST(o_orderkey AS VARCHAR)) AS ho,
             md5('cust:' || CAST(o_custkey AS VARCHAR)) AS hc
      FROM orders
    )
    SELECT o_orderkey,
           substr(ho, 1, 8) || '-' || substr(ho, 9, 4) || '-5'
             || substr(ho, 14, 3) || '-a' || substr(ho, 18, 3) || '-'
             || substr(ho, 21, 12) AS order_uuid,
           substr(hc, 1, 8) || '-' || substr(hc, 9, 4) || '-5'
             || substr(hc, 14, 3) || '-a' || substr(hc, 18, 3) || '-'
             || substr(hc, 21, 12) AS customer_uuid
    FROM h
    """,
    tags=("fn", "project"),
)
def fn_uuid_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic namespaced surrogate keys: UUID-shaped ids minted
    from md5('<namespace>:<natural key>') — same natural key, same id,
    on any engine, any day, any partitioning (unlike uuid()/monotonic
    ids, which are nondeterministic and break reproducible rebuilds).
    Two namespaces on one pass show the same natural key yielding
    DIFFERENT ids per entity type — the collision-avoidance reason
    namespaces exist. The version/variant nibbles are pinned so the
    ids parse as RFC-4122-shaped everywhere.

    Scale: pure projection, zero shuffles, whole-stage codegen; the
    dimension build at 100 TB mints keys map-side with no sequence
    bottleneck or key-server round-trip."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        _uuid5ish("ord", F.col("o_orderkey")).alias("order_uuid"),
        _uuid5ish("cust", F.col("o_custkey")).alias("customer_uuid"),
    )


@register(
    "agg_distinct_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts,
           CAST(count(DISTINCT CASE WHEN l_quantity > 25 THEN l_partkey END)
                AS BIGINT) AS parts_highqty,
           CAST(count(DISTINCT CASE WHEN l_shipdate >= TIMESTAMP '1994-01-01'
                THEN l_suppkey END) AS BIGINT) AS supps_recent
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg",),
)
def agg_distinct_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT …) measures with DIFFERENT per-measure
    filters in ONE aggregation pass — the dashboard query shape
    ('parts touched, parts in bulk lines, suppliers active since
    1994, per flag'). Filters are folded into the distinct argument as
    CASE→NULL (NULLs don't count), which is exactly SQL's
    FILTER-clause semantics for distinct aggregates.

    Scale: Catalyst plans multi-distinct with one Expand (a row per
    distinct measure) feeding partial aggregates — linear in
    rows×measures, one logical shuffle, no per-measure rescan of the
    fact table. When a measure tolerates error, swap in
    approx_count_distinct and the Expand collapses (agg_approx_distinct
    is that registered sibling)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("l_partkey").cast("bigint").alias("parts"),
        F.countDistinct(
            F.when(F.col("l_quantity") > 25, F.col("l_partkey"))
        )
        .cast("bigint")
        .alias("parts_highqty"),
        F.countDistinct(
            F.when(
                F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"),
                F.col("l_suppkey"),
            )
        )
        .cast("bigint")
        .alias("supps_recent"),
    )
