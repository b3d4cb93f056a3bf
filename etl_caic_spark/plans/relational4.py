"""Fourth wave (milestone M9): extended string surface with edit distance,
fuzzy (Levenshtein) near-dup pairs, bitwise functions, arg-min/max and
boolean aggregates, and numeric RANGE window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import widen_narrow_scan


@register(
    "fn_string2",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand_twice,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           contains(p_type, 'BRUSHED') AS is_brushed,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap_line,
           CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS brand_dist
    FROM part
    WHERE p_partkey % 4 = 0
    """,
    tags=("fn", "string"),
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended strings: reverse/repeat/position/contains, global regex
    replace, regex match predicate, Levenshtein edit distance."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 4 == 0)
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.contains("p_type", F.lit("BRUSHED")).alias("is_brushed"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_like("p_type", F.lit("^(ECONOMY|PROMO)")).alias("is_cheap_line"),
        F.levenshtein("p_brand", F.lit("Brand#33")).cast("int").alias("brand_dist"),
    )


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH n AS (
      SELECT p_partkey, p_brand, p_name FROM part WHERE p_partkey % 2 = 0
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM n a
    JOIN n b ON a.p_brand = b.p_brand
            AND a.p_partkey < b.p_partkey
            AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("dedup", "fuzzy"),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance, run INSIDE buckets (p_brand
    here; a MinHash/SimHash band at 100 TB) with a length-difference
    prefilter (|len(a)-len(b)| <= maxdist is a Levenshtein lower bound —
    lossless pruning).

    The bucket key makes this an equi hash join with a residual predicate,
    never a cross product: pair count is Σ per-bucket n², bounded by the
    bucket size — an unbucketed version measured 84s at sf0.1 vs ~1s
    bucketed, the quadratic trap SCALE.md documents."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 0)
    n = p.select("p_partkey", "p_brand", "p_name", F.length("p_name").alias("_len"))
    # The dim-sized build side auto-broadcasts, so the edit-distance
    # evaluation runs at the PROBE side's scan width — widen it.
    a, b = widen_narrow_scan(n).alias("a"), n.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.abs(F.col("a._len") - F.col("b._len")) <= 2),
    )
    return (
        pairs.withColumn(
            "dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("int")
        )
        .filter(F.col("dist") <= 4)
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            "dist",
        )
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(l_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS mixed,
           CAST(bit_count(l_orderkey) AS INT) AS popcount,
           CAST(l_orderkey << 2 AS BIGINT) AS shifted_l,
           CAST(l_orderkey >> 3 AS BIGINT) AS shifted_r
    FROM lineitem
    WHERE l_orderkey % 21 = 0
    """,
    tags=("fn", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor, popcount, shifts (the primitives under
    the SimHash operator)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 21 == 0)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("l_partkey")).alias("mixed"),
        F.bit_count(k).cast("int").alias("popcount"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@register(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS biggest_order,
           CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS smallest_order,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min (max_by/min_by) and boolean aggregates.
    o_totalprice is unique per customer at test SF (doubles), so the
    arg-extrema are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(count(*) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal
             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS BIGINT)
             AS peers_within_500,
           round(sum(c_acctbal) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal
             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW), 2)
             AS trailing_band_sum
    FROM customer
    """,
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frames (value-based, not row-based — frame membership
    is value-determined, so results are deterministic without tiebreaks)."""
    c = load_table(spark, sf_dir, "customer")
    w_band = (
        Window.partitionBy("c_mktsegment").orderBy("c_acctbal").rangeBetween(-500, 500)
    )
    w_trail = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-500, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.count("*").over(w_band).cast("bigint").alias("peers_within_500"),
        F.round(F.sum("c_acctbal").over(w_trail), 2).alias("trailing_band_sum"),
    )
