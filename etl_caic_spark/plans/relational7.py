"""Seventh wave (milestone M15): data profiling (describe-style summary),
contingency tables, null handling (the na.* surface), ANSI-safe try_*
operations, and null-preserving outer explode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "profile_summary",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(count(l_quantity) AS BIGINT) AS n,
           round(avg(l_quantity), 4) AS mean,
           round(stddev_samp(l_quantity), 4) AS sd,
           round(min(l_quantity), 2) AS min_v,
           round(max(l_quantity), 2) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(count(l_extendedprice) AS BIGINT),
           round(avg(l_extendedprice), 4),
           round(stddev_samp(l_extendedprice), 4),
           round(min(l_extendedprice), 2),
           round(max(l_extendedprice), 2)
    FROM lineitem
    """,
    tags=("profile",),
)
def profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style numeric profiling, one row per column — computed
    as a single multi-aggregate pass then unpivoted (describe itself
    returns strings; this keeps typed values for the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")

    def prof(col):
        return li.agg(
            F.lit(col).alias("col"),
            F.count(col).alias("n"),
            F.round(F.avg(col), 4).alias("mean"),
            F.round(F.stddev_samp(col), 4).alias("sd"),
            F.round(F.min(col), 2).alias("min_v"),
            F.round(F.max(col), 2).alias("max_v"),
        )

    return prof("l_quantity").unionByName(prof("l_extendedprice"))


@register(
    "stat_crosstab",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("profile",),
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table (crosstab) via conditional-count pivot — also
    exercises FILTER-style conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_linestatus") == "O").alias("O"),
        F.count_if(F.col("l_linestatus") == "F").alias("F"),
    )


@register(
    "fn_null_handling",
    oracle="""
    WITH holes AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS status_maybe,
             CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END
               AS price_maybe
      FROM orders WHERE o_orderkey % 8 = 0
    )
    SELECT o_orderkey,
           coalesce(status_maybe, 'MISSING') AS status_filled,
           round(coalesce(price_maybe, -1.0), 2) AS price_filled,
           (status_maybe IS NULL OR price_maybe IS NULL) AS had_null,
           status_maybe IS NOT DISTINCT FROM 'F' AS nullsafe_is_f
    FROM holes
    """,
    tags=("fn", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: nulls synthesized with nullif/CASE, then
    na.fill (coalesce), null predicates, and the null-safe equality
    operator (<=> / IS NOT DISTINCT FROM)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 0)
    holes = o.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_maybe"),
        F.when(F.col("o_totalprice") < 50000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price_maybe"),
    )
    filled = holes.na.fill({"status_maybe": "MISSING", "price_maybe": -1.0})
    return filled.select(
        "o_orderkey",
        F.col("status_maybe").alias("status_filled"),
        F.round("price_maybe", 2).alias("price_filled"),
    ).join(
        holes.select(
            "o_orderkey",
            (F.col("status_maybe").isNull() | F.col("price_maybe").isNull()).alias(
                "had_null"
            ),
            F.col("status_maybe").eqNullSafe(F.lit("F")).alias("nullsafe_is_f"),
        ),
        "o_orderkey",
    )


@register(
    "fn_try_ops",
    oracle="""
    SELECT e.event_id,
           TRY_CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k_try,
           TRY_CAST(e.event_type AS INTEGER) AS bogus_cast,
           e.value / nullif(CAST(e.event_id % 3 AS DOUBLE), 0.0) AS safe_div
    FROM events e
    WHERE e.event_id % 6 = 0
    """,
    tags=("fn", "ansi"),
)
def fn_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe operations: try_cast (malformed → NULL instead of error)
    and try_divide (zero denominator → NULL) — the engine's lenient lane
    next to fail-fast defaults (the reference's strict/lenient duality,
    SURVEY.md §1.3)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 6 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_try"),
        F.col("event_type").try_cast("int").alias("bogus_cast"),
        F.try_divide("value", (F.col("event_id") % 3).cast("double")).alias(
            "safe_div"
        ),
    )


@register(
    "explode_outer_nulls",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS words
      FROM documents WHERE doc_id % 35 = 0
    )
    SELECT doc_id, u.word
    FROM src LEFT JOIN (
      SELECT doc_id, unnest(words) AS word FROM src
    ) u USING (doc_id)
    """,
    tags=("fn", "explode"),
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (explode_outer): rows with empty arrays
    survive with a NULL element instead of disappearing — required when
    the exploded side is optional (oracle: LEFT JOIN against the unnest)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 35 == 0)
    src = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>"))
        .otherwise(F.slice(F.split("text", " "), 1, 3))
        .alias("words"),
    )
    return src.select("doc_id", F.explode_outer("words").alias("word"))


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
    tags=("agg", "window"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties broken by
    value order — Spark's mode() leaves ties unspecified, so the engine
    uses count+row_number instead). Two-level shape: the count aggregate
    reduces the fact table map-side, and the row_number window runs over
    |groups|x|distinct values| rows only — at 100 TB the window input is
    KBs. The same shape generalizes to any "argmax per group"."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "dq_referential_integrity",
    oracle="""
    WITH dim AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0),
    o AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM orders LEFT JOIN dim d ON o_custkey = d.c_custkey
    ),
    l AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
        ON l_orderkey = ok.o_orderkey
    )
    SELECT 'orders->customer' AS relation, n_rows, n_orphans,
           round(n_orphans / n_rows, 6) AS orphan_rate
    FROM o
    UNION ALL
    SELECT 'lineitem->orders', n_rows, n_orphans,
           round(n_orphans / n_rows, 6)
    FROM l
    """,
    tags=("dq", "join", "agg"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphan detection across two FK
    relations (orders→customer, lineitem→orders), with the customer dim
    deliberately punctured (custkey % 10 dropped) so the audit provably
    DETECTS violations rather than vacuously passing. Each check is a
    broadcast left join against just the DIM KEY COLUMN (column-pruned
    scan) reduced to counts map-side — at 100 TB the fact table streams
    through once per relation, no fact shuffle. This is the data-quality
    gate a pipeline runs before publishing a snapshot."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 != 0)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def audit(fact, fk, dim, pk, label):
        j = fact.join(F.broadcast(dim), fact[fk] == dim[pk], "left")
        return j.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(dim[pk].isNull(), 1).otherwise(0)).alias("n_orphans"),
        ).select(
            F.lit(label).alias("relation"),
            "n_rows",
            "n_orphans",
            F.round(F.col("n_orphans") / F.col("n_rows"), 6).alias(
                "orphan_rate"
            ),
        )

    okeys = orders.select("o_orderkey").distinct()
    return audit(orders, "o_custkey", cust, "c_custkey", "orders->customer").unionByName(
        audit(li, "l_orderkey", okeys, "o_orderkey", "lineitem->orders")
    )


@register(
    "agg_corr_exact_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM (
        SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
      )
      GROUP BY 1
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS corr_qty_price,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS cov_pop
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_corr_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per group from EXACT
    integer moments: the five sums (Σx, Σy, Σxy, Σx², Σy²) reduce in
    BIGINT (order-independent — the same fixed-point discipline as
    rollup_timeseries), and only the FINAL formula runs in doubles, so
    the result is bit-identical across engines and partitionings —
    unlike F.corr, whose streaming double accumulation is
    partition-order dependent and can flip a 6-decimal rounding.
    Values are rounded to whole units first (quantity is integral;
    price to dollars) so Σy² stays ~1e15 << 2^63 even at sf1000.
    One map-side-combined aggregate; moments compose, so this also
    works as an incremental-MV merge."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity", 0).cast("bigint").alias("x"),
        F.round("l_extendedprice", 0).cast("bigint").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = nd * sxy - sx * sy
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            num / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)), 6
        ).alias("corr_qty_price"),
        F.round(num / (nd * nd), 6).alias("cov_pop"),
    )


@register(
    "fn_bitagg",
    oracle="""
    SELECT user_id,
           CAST(bit_or(flag) AS BIGINT) AS flags_any,
           CAST(bit_xor(flag) AS BIGINT) AS flags_parity,
           CAST(count(DISTINCT flag) AS BIGINT) AS n_distinct_types
    FROM (
      SELECT user_id,
             CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                  ELSE 16 END AS flag
      FROM events
    )
    GROUP BY user_id
    """,
    tags=("agg", "bitwise"),
)
def fn_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates: event types one-hot packed into an int and
    reduced with bit_or (the set of types a user ever produced — a
    64-wide bitmap in ONE bigint, the poor man's bitmap index) and
    bit_xor (parity). Bit reductions are associative+commutative, so
    they map-side combine perfectly — at 100 TB the shuffle carries one
    bigint per (user, column), the cheapest possible per-key state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
        .cast("bigint")
        .alias("flag"),
    )
    return ev.groupBy("user_id").agg(
        F.bit_or("flag").alias("flags_any"),
        F.bit_xor("flag").alias("flags_parity"),
        F.count_distinct("flag").alias("n_distinct_types"),
    )


@register(
    "subquery_lateral_topn",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) l ON true
    WHERE c.c_custkey % 7 = 0
    """,
    tags=("subquery", "join", "sql"),
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join — top-2 orders per customer expressed as
    a per-row dependent subquery (the SQL-standard form; Spark rewrites
    it to a DomainJoin + window internally, so the physical plan is the
    same rank-filter shape as win_topk_per_group, not N correlated
    scans). Registered as literal SQL to pin the engine's lateral-join
    surface alongside the DataFrame formulations."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) l
        WHERE c.c_custkey % 7 = 0
        """
    )
