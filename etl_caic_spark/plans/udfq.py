"""UDF-surface queries (milestone M5): scalar pandas UDF, grouped-agg
pandas UDF, applyInPandas grouped-map, and mapInPandas — each oracled
where the computation is SQL-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import udfs as U
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_orderkey % 6 = 0
    """,
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF; elementwise double math is
    bit-identical to the SQL expression, so no rounding is needed."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 6 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        U.charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS qty_weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (quantity-weighted mean price), rounded on
    both sides (summation order differs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(U.weighted_avg_udf("l_extendedprice", "l_quantity"), 4).alias(
            "qty_weighted_price"
        )
    )


@register(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id, value,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    QUALIFY count(*) OVER (PARTITION BY user_id) >= 2
    """,
    tags=("udf",),
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas per-user z-score — the UDTF-shaped
    extension point (oracle: SQL window twin)."""
    ev = load_table(spark, sf_dir, "events")
    return U.zscore_per_group(ev, "user_id", "value")


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
    FROM events
    """,
    tags=("udf",),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batch-iterator transform (regex JSON field extraction —
    equivalent to the SQL JSON path on this corpus)."""
    ev = load_table(spark, sf_dir, "events")
    return U.parse_props_batches(ev)
