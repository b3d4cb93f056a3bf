"""Core relational operators: scans, filters, projections, joins,
aggregations, sorts, set operations (SURVEY.md §2.C, milestone M1).

Each query is a thin declarative DataFrame expression — Catalyst provides
predicate pushdown, column pruning, broadcast-vs-sort-merge selection and
AQE re-planning (SURVEY.md §4.2). Scale notes are given per query where the
plan shape matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


# ---------------------------------------------------------------------------
# Scans / projections
# ---------------------------------------------------------------------------


@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
    """,
    tags=("scan",),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with projection + predicate pushdown.

    Parity: the reference's only scans are HTTP JSON snapshots
    (reference task.ts:88-107); this is the engine's columnar-file
    equivalent. Scale: filter + 3-column projection reach the parquet
    reader (PushedFilters / ReadSchema in explain), so a 100 TB scan reads
    only the touched column chunks and row groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "project_compute",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS disc_price,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      l_returnflag || '/' || l_linestatus AS flags
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    tags=("project",),
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns + aliasing (reference task.ts:148-169).

    Per-row IEEE arithmetic — bit-identical to the oracle, no rounding
    needed. Whole-stage codegen fuses scan+filter+project into one pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flags"),
    )


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


@register(
    "filter_eq",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'click'
    """,
    tags=("filter",),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter — the reference's type-discriminator predicate
    (σ type='avalancheforecast', reference task.ts:114)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == F.lit("click")).select(
        "event_id", "user_id", "value"
    )


@register(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority LIKE '%URGENT'
      AND NOT (o_custkey % 7 = 0)
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: IN / BETWEEN / LIKE / NOT / AND (generalizes the
    reference's AND-of-guards, task.ts:137-138)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("%URGENT")
        & ~(F.col("o_custkey") % 7 == 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_nullsafe",
    oracle="""
    SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) > 0 AND label IS NOT NULL
    """,
    tags=("filter",),
)
def filter_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safety + size guards (reference task.ts:137-138: drop rows
    lacking non-empty days arrays)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & F.col("label").isNotNull()
    ).select("vec_id", "label", F.size("embedding").alias("dim"))


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_inner",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, p_name, p_brand
    FROM lineitem
    JOIN part ON CAST(l_partkey AS VARCHAR) = CAST(p_partkey AS VARCHAR)
    WHERE p_size > 40
    """,
    tags=("join",),
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast inner equi join, string-normalized key.

    Parity: the reference's Map-probe join with `String(feat.id)` key
    normalization (task.ts:97-100, 140-141). Scale: `part` is the small
    dim — explicit broadcast() avoids the shuffle entirely; the string cast
    is applied on both sides exactly like the reference.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(
        F.broadcast(p),
        li["l_partkey"].cast("string") == p["p_partkey"].cast("string"),
        "inner",
    ).select("l_orderkey", "l_linenumber", "l_quantity", "p_name", "p_brand")


@register(
    "join_sortmerge",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("join",),
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact shuffle (sort-merge) join + aggregation.

    Scale: both sides large → hash-partition on the join key; the merge
    hint pins sort-merge (no broadcast even at test SF). At 100 TB both
    tables would be bucketed by orderkey to make this shuffle-free; AQE
    handles skewed keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    j = li.hint("merge").join(o, li["l_orderkey"] == o["o_orderkey"], "inner")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'NO_SEGMENT') AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with unmatched-row fallback via coalesce."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left")
    return j.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("NO_SEGMENT")).alias("segment")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ), supp AS (
      SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations with customers but no
    suppliers and vice versa survive with zero-filled counts)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = cust.join(supp, cust["nk"] == supp["nk"], "full")
    return j.select(
        F.coalesce(cust["nk"], supp["nk"]).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity >= 49
    )
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS). Parity: the reference's probe-miss `continue`
    makes its join semi-shaped on the area side (task.ts:140-141)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("join",),
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (card-bounded; never done on facts)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "join_range",
    oracle="""
    SELECT p_partkey, p_name, v.bucket
    FROM part
    JOIN (VALUES ('small', 0, 20), ('medium', 20, 35), ('large', 35, 60))
         v(bucket, lo, hi)
      ON p_size >= v.lo AND p_size < v.hi
    """,
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a tiny bucket dimension.

    Scale: the non-equi side is broadcast (a nested-loop join against a
    3-row dim is O(n)); a fact-to-fact range join would instead bucketize
    the range key into an equi-join prefix (see join_asof).
    """
    p = load_table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [("small", 0, 20), ("medium", 20, 35), ("large", 35, 60)],
        "bucket string, lo int, hi int",
    )
    return p.join(
        F.broadcast(buckets),
        (p["p_size"] >= buckets["lo"]) & (p["p_size"] < buckets["hi"]),
    ).select("p_partkey", "p_name", "bucket")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_groupby_q1",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 2) AS avg_qty,
      round(avg(l_extendedprice), 2) AS avg_price,
      round(avg(l_discount), 4) AS avg_disc,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate: filter → group by 2 keys → 8 aggs.

    Scale: partial (map-side) aggregation comes free from groupBy/agg;
    2 grouping keys × 3×2 values → tiny shuffle regardless of input size.
    Double aggregates rounded on both sides (summation order differs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct in one aggregate (expand-based plan).

    Scale: two distinct columns → Catalyst Expand (2× rows pre-shuffle);
    acceptable for low-cardinality groups, else switch to
    approx_count_distinct (see agg_approx_distinct).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (rows-only driver check;
    the pytest property check bounds relative error vs exact).

    Scale: constant-size sketch per group — this, not exact distinct, is
    the 100 TB path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3 AND sum(o_totalprice) > 300000
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("_spend_raw"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("_spend_raw") > 300000))
        .select("o_custkey", "n_orders", F.round("_spend_raw", 2).alias("spend"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
             AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping-id disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS gid,
           round(sum(o_totalprice), 2) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with grouping-id."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "total",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits
# ---------------------------------------------------------------------------


@register(
    "sort_multikey",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal > 9000
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
    tags=("sort",),
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange under the hood).

    The driver's value hash is order-insensitive; determinism comes from the
    full tiebreak (c_custkey is unique)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        )
    )


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort",),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → physical TakeOrderedAndProject (per-partition heap +
    driver merge; never a full sort at scale). Unique o_orderkey tiebreak
    makes the top-100 deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS custkey, 'high_bal' AS tag FROM customer WHERE c_acctbal > 8000
    UNION ALL
    SELECT o_custkey AS custkey, 'big_order' AS tag FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two branches (reference's explode/passthrough append,
    task.ts:173,185). unionByName → no positional-column surprises."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("custkey"), F.lit("high_bal").alias("tag")
    )
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey"), F.lit("big_order").alias("tag")
    )
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup shuffle on the full row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_acctbal") > 8000).select(F.col("c_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, matching SQL)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics, matching SQL)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)
