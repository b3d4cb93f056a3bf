"""Fifth wave (milestone M10): MapType surface, Spark-4 VARIANT JSON
(the engine's answer to the reference's `Type.Any()` escape hatches —
SURVEY.md §1.2 maps them to "VariantType (Spark 4) / JSON string"),
struct build/access, and the higher-order-function surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "fn_map_entries",
    oracle="""
    SELECT o_orderkey, 'status' AS key, o_orderstatus AS value
    FROM orders WHERE o_orderkey % 17 = 0
    UNION ALL
    SELECT o_orderkey, 'priority' AS key, o_orderpriority AS value
    FROM orders WHERE o_orderkey % 17 = 0
    """,
    tags=("fn", "map"),
)
def fn_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build a map from entries, explode it back to
    rows (map_from_entries → explode = the portable, oracle-stable way to
    compare map contents across engines)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0)
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("status").alias("key"), F.col("o_orderstatus").alias("value")),
            F.struct(
                F.lit("priority").alias("key"), F.col("o_orderpriority").alias("value")
            ),
        )
    )
    return o.select("o_orderkey", F.explode(m).alias("key", "value"))


@register(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k,
           CAST(CAST(props->>'k' AS INTEGER) * 2 AS INTEGER) AS k_doubled
    FROM events
    WHERE event_id % 4 = 0
    """,
    tags=("json", "variant"),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: parse_json once, typed variant_get extraction —
    the modern engine treatment of the reference's dynamic `properties:
    Any` payloads (task.ts:13-14): keep the payload semi-structured,
    extract lazily with types."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    v = ev.withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "int")
    return v.select("event_id", k.alias("k"), (k * 2).cast("int").alias("k_doubled"))


@register(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS seg,
           round(c_acctbal, 2) AS bal,
           c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR) AS seg_nation
    FROM customer
    WHERE c_custkey % 2 = 0
    """,
    tags=("fn", "struct"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access + re-projection (the reference's nested
    metadata construction, task.ts:158-167, minus the join context)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    nested = c.select(
        "c_custkey",
        F.struct(
            F.col("c_mktsegment").alias("seg"),
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_nationkey").alias("nation"),
        ).alias("s"),
    )
    return nested.select(
        "c_custkey",
        F.col("s.seg").alias("seg"),
        F.col("s.bal").alias("bal"),
        F.concat_ws(":", F.col("s.seg"), F.col("s.nation").cast("string")).alias(
            "seg_nation"
        ),
    )


@register(
    "fn_higher_order",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id % 30 = 0
    )
    SELECT doc_id,
           len(list_filter(words, x -> length(x) > 4)) > 0 AS has_long_word,
           len(list_filter(words, x -> length(x) > 0)) = len(words) AS all_nonempty,
           coalesce(array_to_string(
             list_sort(list_distinct(list_transform(words, x -> length(x)))),
             ','), '') AS distinct_lengths,
           array_to_string([x for x in generate_series(1, 3)], ',')
             AS one_two_three,
           list_sort(list_distinct(words))[1] AS alpha_first
    FROM w
    """,
    tags=("fn", "hof"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: exists / forall / transform / sequence /
    sorted first element — all JVM-side lambdas inside codegen. Array
    results comma-joined for the driver canonicalizer (int→string exact)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 30 == 0)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.exists(words, lambda x: F.length(x) > 4).alias("has_long_word"),
        F.forall(words, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.transform(words, lambda x: F.length(x)))
            ).cast("array<string>"),
            ",",
        ).alias("distinct_lengths"),
        F.array_join(F.sequence(F.lit(1), F.lit(3)).cast("array<string>"), ",").alias(
            "one_two_three"
        ),
        F.element_at(F.array_sort(F.array_distinct(words)), 1).alias("alpha_first"),
    )
