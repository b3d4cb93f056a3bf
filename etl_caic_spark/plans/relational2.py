"""Second wave of relational surface (milestone M7): pivot/unpivot,
grouping sets, statistical aggregates, exact percentiles, ordered string
aggregation, scalar subqueries, and the remaining window analytics
(ntile / percent_rank / cume_dist / first-last value)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "pivot_wide",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide (explicit value list so the plan is a single pass —
    at scale an un-listed pivot needs an extra distinct scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey % 11 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val
    FROM lineitem WHERE l_orderkey % 11 = 0
    """,
    tags=("pivot",),
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long via stack() (SQL-standard UNPIVOT dual)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 11 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (measure, val)"
        ),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via the SQL API —
    Catalyst expands to a single Expand + aggregate, no multi-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gsets_tmp")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM li_gsets_tmp
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_samp(o_totalprice), 4) AS price_sd,
           round(corr(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS price_cust_corr,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev, correlation, exact
    interpolated percentiles (median/p90 — Spark `percentile` ==
    DuckDB `quantile_cont`)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("price_sd"),
        F.round(F.corr("o_totalprice", F.col("o_custkey").cast("double")), 6).alias(
            "price_cust_corr"
        ),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register("agg_approx_quantile", oracle=None, tags=("agg", "approx"))
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) — the 100 TB path for
    quantiles (constant memory per group); accuracy-bounded pytest check,
    rows-only for the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
            "approx_median"
        ),
        F.count("*").alias("n"),
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM (
      SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    )
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect → sort → join (deterministic
    regardless of partition arrival order — collect_list alone is not)."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias(
            "segments"
        )
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
             AS price_ratio
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (Catalyst plans it as a broadcast of
    the 1-row aggregate — one extra tiny job, no per-row recompute)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_scalar_tmp")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM orders_scalar_tmp), 6)
                 AS price_ratio
        FROM orders_scalar_tmp
        WHERE o_orderkey % 7 = 0
        """
    )


@register(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile,
           round(percent_rank() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal), 6) AS cume,
           first_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal, c_custkey) AS poorest
    FROM customer
    """,
    tags=("window",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile (full tiebreak for
    determinism), percent_rank / cume_dist (value-determined), first_value."""
    c = load_table(spark, sf_dir, "customer")
    w_tb = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_v = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w_tb).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w_v), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_v), 6).alias("cume"),
        F.first_value("c_custkey").over(w_tb).alias("poorest"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark percentile ==
    DuckDB quantile_cont, both index = p*(n-1) with interpolation) — the
    exact twin of agg_approx_quantile's sketch path. Exact percentile
    sorts within the group; at 100 TB use percentile_approx instead (the
    registered approx query) — this is the correctness anchor. All three
    quantiles come from ONE percentile(array(...)) aggregate, so the group's
    values are buffered and sorted once, not three times."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("_q"),
        F.count("*").alias("n"),
    )
    return qs.select(
        "l_returnflag",
        F.round(F.element_at("_q", 1), 6).alias("p25"),
        F.round(F.element_at("_q", 2), 6).alias("p50"),
        F.round(F.element_at("_q", 3), 6).alias("p75"),
        "n",
    )


@register(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INT)
             AS n_long_words,
           coalesce(array_to_string(regexp_extract_all(text,
             '[a-z]{6,}'), '|'), '') AS long_words,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g')
             AS devoweled,
           (text SIMILAR TO '.*window.*') AS mentions_window
    FROM documents
    WHERE doc_id % 13 = 0
    """,
    tags=("scalar", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family over order comments: first-match extract,
    extract-all (stringified — the driver canonicalizer takes scalars
    only), global replace, and a regexp predicate. All codegen'd JVM
    regexps — the workhorses of log/text wrangling."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0))
        .cast("int")
        .alias("n_long_words"),
        F.coalesce(
            F.array_join(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0), "|"),
            F.lit(""),
        ).alias("long_words"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "devoweled"
        ),
        F.col("text").rlike(".*window.*").alias("mentions_window"),
    )
