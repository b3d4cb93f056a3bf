"""Eighth wave (round 5): warehouse-scale aggregation and change-data
patterns — bitmap-chunked exact distinct counting (the Roaring-bitmap
trick, expressed as two partial-aggregatable groupBys), FILTER-clause
conditional aggregates, NOT IN three-valued-logic semantics pinned
against NOT EXISTS, the TPC-H Q10 join shape, and CDC apply-changes with
delete handling (the log-to-snapshot operator under every lakehouse
MERGE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN value > 250 THEN user_id END)
                AS BIGINT) AS n_heavy_users
    FROM events
    GROUP BY 1
    """,
    tags=("agg", "distinct", "scale"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via 64-bit bitmap chunks instead of
    COUNT(DISTINCT): key -> (bucket = key >> 6, bit = key & 63), stage 1
    ORs bit masks per (group, bucket), stage 2 sums popcounts per group.

    Why it matters at 100 TB: COUNT(DISTINCT) shuffles every (group, key)
    pair and cannot partially aggregate across keys; the bitmap form is a
    plain two-level groupBy where stage 1 map-side-combines down to at
    most |groups| x |key_space|/64 rows of 8 bytes each — for a dense
    int key space that is a 64x shuffle reduction, and both stages stay
    inside whole-stage codegen (bit_or / bit_count are JVM intrinsics).
    Multiple distinct measures (here: all users vs heavy users) ride the
    SAME shuffle instead of one expand branch per measure. For sparse or
    non-integral keys, dictionary-encode (dense_rank) or hash first; the
    hashed variant trades exactness for collision odds like HLL does."""
    ev = load_table(spark, sf_dir, "events")
    # shiftleft() in the Python API takes a literal shift; the column-valued
    # shift is the SQL form (still a JVM intrinsic inside codegen).
    bit = F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))")
    heavy_bit = F.when(F.col("value") > 250, bit).otherwise(F.lit(0).cast("long"))
    chunks = ev.groupBy(
        "event_type", F.shiftright("user_id", 6).alias("bucket")
    ).agg(
        F.bit_or(bit).alias("bm"),
        F.bit_or(heavy_bit).alias("bm_heavy"),
    )
    return chunks.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).alias("n_users"),
        F.sum(F.bit_count("bm_heavy")).alias("n_heavy_users"),
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           round(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2)
             AS big_total,
           round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
             AS avg_open
    FROM orders
    GROUP BY 1
    """,
    tags=("agg",),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (SQL FILTER clause) — several differently-
    filtered measures in ONE aggregation pass over one scan, the idiom
    that replaces N self-joins of per-condition subaggregates. Spark
    expresses FILTER as agg(CASE WHEN): identical plan, one shuffle.
    SUM over a group with no qualifying row is NULL (not 0) and COUNT is
    0 on both engines — the NULL contract is part of what's pinned."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.round(
            F.sum(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice"))), 2
        ).alias("big_total"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("avg_open"),
    )


@register(
    "subquery_not_in_nulls",
    oracle="""
    WITH clean AS (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus <> 'P'
    ),
    polluted AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
      FROM orders
    )
    SELECT
      CAST((SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM clean)) AS BIGINT)
        AS n_not_in_clean,
      CAST((SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM polluted)) AS BIGINT)
        AS n_not_in_polluted,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM polluted p
                              WHERE p.k = c.c_custkey)) AS BIGINT)
        AS n_not_exists
    """,
    tags=("subquery", "semantics"),
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued logic, pinned: against a NULL-free list NOT IN
    is a plain anti-join; one NULL in the list makes every NOT IN
    predicate UNKNOWN, so the polluted count MUST be 0 while the
    NOT EXISTS twin still anti-joins on the non-null keys. Catalyst
    plans the polluted NOT IN as a null-aware anti join (a dedicated
    physical strategy — at scale prefer NOT EXISTS, which is an ordinary
    left-anti shuffle join, whenever the list can carry NULLs)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_nin_tmp")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_nin_tmp")
    return spark.sql(
        """
        WITH clean AS (
          SELECT o_custkey AS k FROM orders_nin_tmp WHERE o_orderstatus <> 'P'
        ),
        polluted AS (
          SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
          FROM orders_nin_tmp
        )
        SELECT
          CAST((SELECT count(*) FROM customer_nin_tmp
                WHERE c_custkey NOT IN (SELECT k FROM clean)) AS BIGINT)
            AS n_not_in_clean,
          CAST((SELECT count(*) FROM customer_nin_tmp
                WHERE c_custkey NOT IN (SELECT k FROM polluted)) AS BIGINT)
            AS n_not_in_polluted,
          CAST((SELECT count(*) FROM customer_nin_tmp c
                WHERE NOT EXISTS (SELECT 1 FROM polluted p
                                  WHERE p.k = c.c_custkey)) AS BIGINT)
            AS n_not_exists
        """
    )


@register(
    "tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    HAVING sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) > 500000
    """,
    tags=("headline", "join", "agg"),
)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): 4-way join with a
    selective fact filter and a date-range dimension filter, aggregated
    per customer. The returnflag and orderdate predicates sit directly on
    the scans (pushed to parquet), orders⨝lineitem shuffles on orderkey,
    the re-key to custkey is the one unavoidable second shuffle, and
    25-row nation is broadcast — the plan you want at 100 TB. Revenue is
    summed in integer cents (per-row double product rounded once, then a
    BIGINT sum) so the group totals and the HAVING boundary are exact on
    both engines regardless of summation order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    cents = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", cents)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("rev_cents").alias("cents_sum"))
        .filter(F.col("cents_sum") > 500000)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("cents_sum") / 100.0).alias("revenue"),
        )
    )


@register(
    "cdc_apply_changes",
    oracle="""
    WITH log AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT user_id, op, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_changes
      FROM log
    )
    SELECT user_id, value AS last_value,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked
    WHERE rn = 1 AND op = 'U'
    """,
    tags=("cdc", "pipeline"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes: collapse an ordered upsert/delete change log to
    the current snapshot — keep each key's LAST change by (ts, event_id)
    and drop keys whose last change is a delete. This is the log-to-table
    half of a lakehouse MERGE (scd_upsert covers the table-to-table
    half); the events feed stands in as the log with event_type='error'
    mapped to a tombstone. One hash shuffle on the key, then a single
    window pass — no join; at scale the row_number dedup pattern
    partially collapses map-side under AQE when logs are pre-bucketed."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(wc))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("n_changes").cast("bigint").alias("n_changes"),
        )
    )
