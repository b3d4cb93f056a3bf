"""TPC-H completion wave (round 5): the 13 query shapes not yet in the
registry — Q2, Q4, Q6, Q8, Q9, Q11, Q13, Q15, Q16, Q17, Q20, Q21, Q22.
With q1/q3/q5/q7/q10/q12/q14/q18/q19 already registered this makes the
full 22-query TPC-H pattern suite, each adapted to the fixture's columns
(no partsupp table, no commit/receipt dates, no comments/phones — each
docstring names the stand-in) and each oracled exactly against DuckDB.

Exactness conventions (registry docstring): money in integer cents
(per-row round → BIGINT sum), quantities are integral-valued doubles so
their sums/avgs are order-independent-exact, ratios are computed with the
identical expression tree on both engines, timestamps compared against
TIMESTAMP literals.

These shapes matter at 100 TB because together they cover the planner
patterns a warehouse engine must get right: join-back-to-min (Q2),
EXISTS/NOT-EXISTS semi/anti joins (Q4, Q22), scan-only predicate
aggregation (Q6), ratio-within-group (Q8), multi-dimension star joins
(Q9), scalar-subquery HAVING (Q11), outer-join-with-ON-filter
distribution (Q13), argmax-by-scalar-subquery (Q15), NOT-IN + count
distinct (Q16), correlated-average filters (Q17), dominant-share
nested aggregation (Q20), and window-over-grouped anti-semantics (Q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


def _cents(col: str, factor=None) -> F.Column:
    expr = F.col(col) if factor is None else F.col(col) * factor
    return F.round(expr * 100).cast("bigint")


@register(
    "tpch_q2_shape",
    oracle="""
    WITH eu AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey AS partkey, min(price_cents) AS best_price_cents
      FROM eu GROUP BY 1
    )
    SELECT DISTINCT p_partkey, p_name, s_name, n_name, s_acctbal,
           best_price_cents
    FROM eu
    JOIN best ON eu.l_partkey = best.partkey
             AND eu.price_cents = best.best_price_cents
    JOIN part ON p_partkey = eu.l_partkey
    JOIN supplier ON s_suppkey = eu.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size BETWEEN 12 AND 18 AND p_type = 'LARGE'
    """,
    tags=("headline", "join", "tpch"),
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for LARGE size-12..18 parts,
    the EUROPE suppliers quoting the minimum observed price
    (l_extendedprice stands in for the missing ps_supplycost). The
    correlated-min subquery becomes a groupBy-min + equality join-back —
    the distributed argmin idiom that avoids any window sort. The
    supplier→nation→region dimension chain broadcasts; the only shuffles
    are the partkey min and the join-back on (partkey, cents). DISTINCT
    collapses duplicate quotes at the same min. At 100 TB the min-agg is
    map-side combinable and the join-back key (partkey) is the same
    partitioning both sides — AQE plans it shuffle-once."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(12, 18) & (F.col("p_type") == "LARGE")
    )
    eu = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            _cents("l_extendedprice").alias("price_cents"),
        )
    )
    best = eu.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.min("price_cents").alias("best_price_cents")
    )
    return (
        eu.join(
            best,
            (F.col("l_partkey") == F.col("partkey"))
            & (F.col("price_cents") == F.col("best_price_cents")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            "best_price_cents",
        )
        .distinct()
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1
    """,
    tags=("headline", "join", "tpch"),
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): one quarter of orders
    that had at least one line shipped more than 30 days after the order
    date (the late-ship proxy for the fixture's missing
    commitdate<receiptdate). EXISTS compiles to a LEFT SEMI join with a
    non-equi residual — the semi join stops probing an order at its
    first late line, so the build side never duplicates rows. The date
    filter prunes the orders scan before the shuffle; at 100 TB the semi
    join shuffles only (orderkey, orderdate) against (orderkey,
    shipdate) — two narrow columns each."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q6_shape",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("headline", "agg", "pushdown", "tpch"),
)
def tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    scan-only query — three pushed predicates, zero joins, one global
    sum. All three filters reach the parquet scan as PushedFilters and
    the projection reads exactly three columns; the aggregate is a
    map-side partial + single-row exchange. This is the query whose
    100 TB cost is pure IO bandwidth — any plan that shuffles more than
    one row per partition is wrong. Revenue = extendedprice * discount
    (the discounted amount itself), per-row exact in integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents("l_extendedprice", F.col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q8_shape",
    oracle="""
    WITH t AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS cents,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents
                               ELSE 0 END) AS BIGINT)
                 / CAST(sum(cents) AS BIGINT), 6) AS mkt_share,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM t GROUP BY 1
    """,
    tags=("headline", "join", "tpch"),
)
def tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    STANDARD-part revenue sold into the AMERICA market, per year. The
    8-table star join: lineitem is the single fact; part, orders (well,
    orders is a second fact — it shuffles on orderkey), and the two
    customer/supplier→nation(→region) dimension chains all broadcast at
    dimension size. The share is a conditional-sum ratio inside one hash
    aggregate — no self-join. Catalyst pushes p_type and the date range
    to the scans and prunes region before the join. Exact: BIGINT cents
    on both sides of one double division, identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    t = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_regionkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _cents("l_extendedprice", 1 - F.col("l_discount")).alias("cents"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(0)
    ) / F.sum("cents")
    return t.groupBy("o_year").agg(
        F.round(share, 6).alias("mkt_share"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "tpch_q9_shape",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("headline", "join", "tpch"),
)
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): revenue from 'red' parts by
    supplier nation and order year (no ps_supplycost in the fixture, so
    profit = discounted revenue). The LIKE '%red%' predicate can't use
    stats but still prunes part BEFORE the join — the selective
    dimension filter then shrinks the fact via the partkey join. part
    and supplier→nation broadcast; orders co-shuffles with lineitem on
    orderkey. Group-by on two low-cardinality keys → tiny result, fully
    map-side combinable. The 100 TB plan: one fact-fact shuffle, three
    broadcasts, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(_cents("l_extendedprice", 1 - F.col("l_discount"))).alias(
                "profit_cents"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q11_shape",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_6')
      GROUP BY 1
    )
    SELECT partkey, value_cents
    FROM v
    WHERE value_cents > (SELECT 0.001 * CAST(sum(value_cents) AS BIGINT)
                         FROM v)
    """,
    tags=("headline", "agg", "subquery", "tpch"),
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose traded value
    through NATION_1/NATION_6 suppliers exceeds 0.1% of those nations'
    total (lineitem value stands in for ps_supplycost*ps_availqty). The
    scalar-subquery HAVING is the two-phase global-threshold idiom:
    aggregate once per part, reduce that to one global row, broadcast it
    back as a cross join, filter. Spark reuses the per-part aggregate
    for both phases (same cached lineage), so lineitem is scanned once.
    The threshold compare is bigint > 0.001*bigint — identical double
    math both engines. At 100 TB the only big shuffle is the partkey
    aggregate; the global sum is a one-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_6")
    )
    v = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = v.agg((F.lit(0.001) * F.sum("value_cents")).alias("_threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("_threshold"))
        .select("partkey", "value_cents")
    )


@register(
    "tpch_q13_shape",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY 1
    """,
    tags=("headline", "join", "agg", "tpch"),
)
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): how many customers
    placed how many non-'5-LOW' orders — including zero. The hallmark is
    the filter INSIDE the outer-join ON clause (o_orderpriority <>
    '5-LOW' replaces the fixture-less o_comment NOT LIKE): moving it to
    WHERE would silently drop order-less customers. count(o_orderkey)
    counts only matched rows, so unmatched customers report 0. Two
    aggregations: custkey (big, map-side combinable) then c_count
    (tiny). At 100 TB the outer join shuffles on custkey; the histogram
    is a one-column re-aggregation — this is the standard long-tail
    activity histogram for any entity."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_shape",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_cents
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_cents = (SELECT max(total_cents) FROM rev)
    """,
    tags=("headline", "subquery", "tpch"),
)
def tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    revenue in 1997 Q1 — the original's view + scalar-subquery-max,
    here the aggregate-then-argmax-join-back idiom. Revenue per supplier
    is one pruned-scan aggregate; the max reduces that to a single
    broadcast row; equality (exact, integer cents — no double-compare
    hazard) selects the winner(s), ties included, which is what makes
    the result deterministic without ORDER BY. At 100 TB: one shuffle
    on suppkey, a one-row exchange, and a broadcast dimension join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_cents("l_extendedprice", 1 - F.col("l_discount"))).alias("total_cents")
    )
    top = rev.agg(F.max("total_cents").alias("_max_cents"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_cents") == F.col("_max_cents"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("headline", "join", "agg", "tpch"),
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) slice, excluding flagged suppliers
    (negative s_acctbal stands in for the 'Customer Complaints' comment
    scan). The NOT IN subquery is a broadcast LEFT ANTI join — safe here
    because s_suppkey is non-null, the 3VL trap subquery_not_in_nulls
    covers separately. count(DISTINCT) over the 3-key group expands to
    a two-phase aggregate; at 100 TB the first phase dedups
    (brand,type,size,suppkey) map-side, so the wide shuffle carries
    already-distinct rows. part is filtered before the join — IN-list
    and <> predicates both push to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q17_shape",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) / 7.0 / 100.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq.partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < 0.2 * avg_qty
    """,
    tags=("headline", "subquery", "tpch"),
)
def tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue lost if
    Brand#12 orders below 20% of the part's average quantity were not
    filled. The correlated per-part average decorrelates into a partkey
    aggregate joined back to the fact — lineitem is read twice but the
    second read only needs (partkey, quantity, price). Quantities are
    integral-valued doubles, so sum and avg are order-independent exact,
    and 0.2*avg is the same double on both engines — the strict < has no
    FP ambiguity. At 100 TB both sides of the join-back share partkey
    partitioning; the brand filter broadcasts part to prune early."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    pq = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_cents("l_extendedprice")) / 7.0 / 100.0, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q20_shape",
    oracle="""
    WITH sp AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum(l_quantity) AS qty_sp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    pt AS (SELECT partkey, sum(qty_sp) AS qty_p FROM sp GROUP BY 1),
    dominant AS (
      SELECT DISTINCT suppkey
      FROM sp
      JOIN pt USING (partkey)
      JOIN part ON p_partkey = partkey
      WHERE p_name LIKE 'small%' AND qty_sp > 0.5 * qty_p
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN dominant ON s_suppkey = suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
    """,
    tags=("headline", "subquery", "tpch"),
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): ASIA suppliers who
    shipped more than half of 1997's volume of some 'small…' part (the
    dominant-supplier rewrite of ps_availqty > 0.5*sum(qty)). Nested
    aggregation: (part,supplier) sums roll up to part totals — the
    second aggregate reuses the first's partitioning, so it's
    shuffle-free under AQE. The share compare is exact (integral-valued
    quantity doubles). DISTINCT suppkey collapses multi-part dominance
    before the tiny supplier/nation/region semi-chain. At 100 TB the
    one real shuffle is the (partkey,suppkey) aggregate; everything
    after operates on dimension-sized data."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sp = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.sum("l_quantity").alias("qty_sp"))
    pt = sp.groupBy("partkey").agg(F.sum("qty_sp").alias("qty_p"))
    dominant = (
        sp.join(pt, "partkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("partkey"))
        .filter(F.col("qty_sp") > 0.5 * F.col("qty_p"))
        .select("suppkey")
        .distinct()
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "tpch_q21_shape",
    oracle="""
    WITH sup_ord AS (
      SELECT l_orderkey AS orderkey, l_suppkey AS suppkey,
             max(l_shipdate) AS sup_last
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    w0 AS (
      SELECT orderkey, suppkey, sup_last,
             max(sup_last) OVER (PARTITION BY orderkey) AS ord_last,
             count(*) OVER (PARTITION BY orderkey) AS n_supp
      FROM sup_ord
    ),
    w AS (
      SELECT orderkey, suppkey, sup_last, ord_last, n_supp,
             sum(CASE WHEN sup_last = ord_last THEN 1 ELSE 0 END)
               OVER (PARTITION BY orderkey) AS n_at_last
      FROM w0
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM w JOIN supplier ON s_suppkey = suppkey
    WHERE n_supp >= 2 AND n_at_last = 1 AND sup_last = ord_last
    GROUP BY 1, 2
    """,
    tags=("headline", "window", "tpch"),
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): in finished
    multi-supplier orders, count per supplier the orders where they
    alone shipped last (sole latest max shipdate — the EXISTS other
    supplier / NOT EXISTS later-supplier pair of the original, with
    shipdate standing in for receipt-vs-commit lateness). Grouping to
    (order, supplier) first shrinks the window input ~4× and makes the
    window partition key the groupBy key — one shuffle serves both. The
    sole-last condition (n_at_last = 1) resolves ties deterministically
    on both engines without any ORDER BY. At 100 TB this is the
    grouped-window pattern: aggregate, then analytic over the aggregate,
    never a self-join of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    sup_ord = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.max("l_shipdate").alias("sup_last"))
    )
    wo = Window.partitionBy("orderkey")
    w0 = sup_ord.select(
        "orderkey",
        "suppkey",
        "sup_last",
        F.max("sup_last").over(wo).alias("ord_last"),
        F.count("*").over(wo).alias("n_supp"),
    )
    w = w0.withColumn(
        "n_at_last",
        F.sum(
            F.when(F.col("sup_last") == F.col("ord_last"), 1).otherwise(0)
        ).over(wo),
    )
    return (
        w.filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_at_last") == 1)
            & (F.col("sup_last") == F.col("ord_last"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_shape",
    oracle="""
    WITH thr AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               / CAST(count(*) AS BIGINT) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0
    ),
    rich_inactive AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer CROSS JOIN thr
      WHERE CAST(round(c_acctbal * 100) AS BIGINT) > avg_cents
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(cents) AS BIGINT) AS total_acctbal_cents
    FROM rich_inactive GROUP BY 1
    """,
    tags=("headline", "subquery", "tpch"),
)
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): per nation, the
    above-average-balance customers with no recent orders (no c_phone in
    the fixture, so nationkey replaces the country-code substring, and
    'no orders since 2000' replaces 'no orders ever' to keep the result
    non-trivial). Three planner features in one query: a scalar-subquery
    threshold (computed in exact integer cents — sum(cents)/count, so
    the boundary compare is FP-identical on both engines), a broadcast
    one-row cross join to apply it, and a NOT EXISTS → LEFT ANTI join
    with a pushed date filter on the inner side. At 100 TB the anti
    join's build side is only the active custkeys after pruning —
    typically a fraction of orders — and customer never shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_cents("c_acctbal")) / F.count("*")).alias("avg_cents")
    )
    rich = (
        c.crossJoin(F.broadcast(thr))
        .filter(_cents("c_acctbal") > F.col("avg_cents"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select(
            "c_custkey", "c_nationkey", _cents("c_acctbal").alias("cents")
        )
    )
    return rich.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("numcust"),
        F.sum("cents").alias("total_acctbal_cents"),
    )
