"""Tenth wave (round 5, cont.): three more TPC-H shapes (Q12's
conditional-count join, Q14's promo-revenue ratio, Q19's disjunctive
OR-of-ANDs join), degree top-k over the event graph, OHLC time-bar
resampling, a truncated-EWMA window chain, smoothed target encoding, and
robust/min-max feature scaling — the remaining feature-prep and
reporting patterns a training-data pipeline leans on.

All oracled: double sums go through the integer-cents convention,
percentiles reuse the proven percentile==quantile_cont parity, and the
EWMA chain is written as the identical Horner nesting on both engines so
IEEE doubles match bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT l_linestatus AS shipclass,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=("headline", "join", "agg"),
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority audit; l_linestatus stands in
    for the fixture's missing l_shipmode): fact-fact join with the date
    filter pushed to the lineitem scan, then conditional counts by
    priority class. One shuffle on orderkey (AQE picks SMJ/shuffled-hash
    by size); the CASE sums fold into the same hash aggregate — a
    two-column result regardless of input size, so the plan is
    scan-bound at 100 TB (reference: task.ts:114-150's filter+classify
    stage applied to a join)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("shipclass"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_shape",
    oracle="""
    WITH j AS (
      SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS cents,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
    )
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents
                                       ELSE 0 END) AS BIGINT)
                 / CAST(sum(cents) AS BIGINT), 6) AS promo_revenue_pct,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM j
    """,
    tags=("headline", "join", "agg"),
)
def tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one month of lineitem joined
    to part, conditional revenue ratio. The month predicate prunes the
    fact scan (PushedFilters on l_shipdate); part joins on partkey — at
    sf the dimension broadcasts, at 100 TB it's a shuffle join where
    only p_partkey+p_type survive column pruning. Revenue in integer
    cents; the final pct is one exact BIGINT/BIGINT division performed
    identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = load_table(spark, sf_dir, "part")
    cents = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(cents, "p_type")
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0))
            / F.sum("cents"),
            6,
        ).alias("promo_revenue_pct"),
        F.sum("cents").alias("total_cents"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q19_shape",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("headline", "join", "pushdown"),
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    classic OR-of-ANDs join filter. Catalyst factors the disjunction
    per side — part gets (brand,size) OR-branches, lineitem gets the
    derived l_quantity BETWEEN 1 AND 30 envelope — so BOTH scans prune
    before the join instead of evaluating the cross-table OR afterward;
    the residual OR runs post-join on the survivors. This
    push-through-disjunction is the difference between scanning 3 brands
    and scanning all of part at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 5)
        & q.between(1, 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & q.between(10, 20)
        | (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 15)
        & q.between(20, 30)
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )


_DEGREE_GRAPH_SQL = """
    WITH seq AS (
      SELECT lag(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS src,
             user_id AS dst
      FROM events
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM seq
      WHERE src IS NOT NULL AND src <> dst
    ),
    nodes AS (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    outd AS (SELECT src AS v, count(*) AS out_deg FROM edges GROUP BY 1),
    ind  AS (SELECT dst AS v, count(*) AS in_deg  FROM edges GROUP BY 1)
    SELECT v AS user_id,
           CAST(coalesce(out_deg, 0) AS BIGINT) AS out_deg,
           CAST(coalesce(in_deg, 0) AS BIGINT) AS in_deg,
           CAST(coalesce(out_deg, 0) + coalesce(in_deg, 0) AS BIGINT) AS degree
    FROM nodes LEFT JOIN outd USING (v) LEFT JOIN ind USING (v)
    ORDER BY degree DESC, v ASC
    LIMIT 25
"""


@register("graph_degree_topk", oracle=_DEGREE_GRAPH_SQL, tags=("graph",))
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 highest-degree vertices of the event-interaction graph
    (same deterministic edge derivation as graph_pagerank: user → prior
    user within an event_type stream). Two groupBy passes over the edge
    list plus an outer join, then TakeOrderedAndProject — the top-k
    never materializes a full sort. The (degree DESC, v ASC) tiebreak
    makes the LIMIT set total-order deterministic, which is what lets an
    order-insensitive hash comparison pin it. At 100 TB degree counting
    is the map-side-combinable shuffle you want; the skew risk lives in
    DISTINCT over edges, which AQE handles with coalesced/split
    partitions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    edges = (
        ev.select(F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst"))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    outd = edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("out_deg"))
    ind = edges.groupBy(F.col("dst").alias("v")).agg(F.count("*").alias("in_deg"))
    deg = (
        nodes.join(outd, "v", "left")
        .join(ind, "v", "left")
        .select(
            F.col("v").alias("user_id"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias(
                "degree"
            ),
        )
    )
    return deg.orderBy(F.desc("degree"), F.asc("user_id")).limit(25)


@register(
    "ts_resample_ohlc",
    oracle="""
    WITH ranked AS (
      SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS bar_month,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('month', ts)
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('month', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_month,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           max(value) AS high,
           min(value) AS low,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked
    GROUP BY 1, 2
    """,
    tags=("timeseries", "agg"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling (the financial downsample; also the shape of
    any first/last-in-window rollup): per (event_type, month) bar emit
    open/close (first/last by a TOTAL order — (ts, event_id) breaks
    duplicate-timestamp ties, without which first/last is
    nondeterministic), high/low, volume, and a cents-exact value sum.
    Both row_number directions share one hash shuffle on the bar key and
    one sort each; the conditional-max trick folds first/last into the
    same hash aggregate instead of re-joining bar edges. At 100 TB this
    is a single-shuffle windowed pass; min_by/max_by would save the sort
    but ties on bare ts would then be engine-dependent."""
    ev = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("month", F.col("ts"))
    wa = Window.partitionBy("event_type", "_bar").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = Window.partitionBy("event_type", "_bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.withColumn("_bar", bar).select(
        "event_type",
        F.col("_bar").cast("date").alias("bar_month"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bar_month").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count("*").alias("volume"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )


def _ewma_sql_chain(depth: int) -> str:
    """Horner-nested truncated EWMA numerator/denominator SQL, built to
    textually mirror the Spark expression tree (same nesting, same op
    order → identical IEEE doubles)."""
    num = "0.0"
    den = "0.0"
    for j in range(depth, 0, -1):
        num = f"(coalesce(lag(value, {j}) OVER w, 0.0) + 0.5 * {num})"
        den = f"((CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0.0 ELSE 1.0 END) + 0.5 * {den})"
    num = f"(value + 0.5 * {num})"
    den = f"(1.0 + 0.5 * {den})"
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_sql_chain(8)

_EWMA_ORACLE = f"""
    WITH chain AS (
      SELECT user_id,
             {_EWMA_NUM} AS num,
             {_EWMA_DEN} AS den,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           round(num / den, 6) AS ewma_last
    FROM chain WHERE rn = 1
"""


@register("ts_ewma", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (α=1/2, depth 8)
    of each user's event values, reported at the latest event. True EWMA
    is a per-row recursion Spark's window frames can't express without a
    stateful UDF; the depth-8 truncation (residual weight 2^-9) rewrites
    it as a FIXED lag chain — pure JVM window expressions, one shuffle,
    no Python. The numerator/denominator are Horner-nested with α=0.5
    (a power of two, so every multiply is exact) in the SAME order on
    both engines, making an unrounded double oracle possible; the
    denominator re-normalizes at partition heads where lags are NULL.
    At 100 TB: one hash shuffle on user_id, one sort — the same cost as
    any windowed feature."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))

    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(8, 0, -1):
        lj = F.lag("value", j).over(w)
        num = F.coalesce(lj, F.lit(0.0)) + F.lit(0.5) * num
        den = F.when(lj.isNull(), 0.0).otherwise(1.0) + F.lit(0.5) * den
    num = F.col("value") + F.lit(0.5) * num
    den = F.lit(1.0) + F.lit(0.5) * den

    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    chain = ev.select(
        "user_id",
        num.alias("num"),
        den.alias("den"),
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wc).alias("n_events"),
    )
    return chain.filter(F.col("rn") == 1).select(
        "user_id",
        "n_events",
        F.round(F.col("num") / F.col("den"), 6).alias("ewma_last"),
    )


@register(
    "feat_target_encode",
    oracle="""
    WITH t AS (
      SELECT c_mktsegment AS segment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM customer JOIN orders ON c_custkey = o_custkey
    ),
    g AS (
      SELECT CAST(sum(cents) AS BIGINT) AS gsum,
             CAST(count(*) AS BIGINT) AS gcnt
      FROM t
    ),
    s AS (
      SELECT segment, CAST(sum(cents) AS BIGINT) AS ssum,
             CAST(count(*) AS BIGINT) AS scnt
      FROM t GROUP BY 1
    )
    SELECT segment, scnt AS n_orders,
           round(((ssum + 10.0 * (gsum / gcnt)) / (scnt + 10)) / 100.0, 4)
             AS target_enc
    FROM s CROSS JOIN g
    """,
    tags=("features", "ml"),
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding (the categorical-feature workhorse):
    encode c_mktsegment by its customers' mean order value, shrunk
    toward the global mean with pseudo-count m=10 —
    (sum + m·global_mean)/(n + m). Sums are exact integer cents; the
    global aggregate is a 1-row cross join (broadcast). At 100 TB the
    encoding table is tiny (one row per category) and is applied back to
    the fact side as a broadcast map-join — the aggregation here is the
    only shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    t = c.join(o, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = t.agg(
        F.sum("cents").alias("gsum"),
        F.count("*").alias("gcnt"),
    )
    s = t.groupBy("segment").agg(
        F.sum("cents").alias("ssum"),
        F.count("*").alias("scnt"),
    )
    return s.crossJoin(F.broadcast(g)).select(
        "segment",
        F.col("scnt").alias("n_orders"),
        F.round(
            (
                (F.col("ssum") + F.lit(10.0) * (F.col("gsum") / F.col("gcnt")))
                / (F.col("scnt") + 10)
            )
            / 100.0,
            4,
        ).alias("target_enc"),
    )


@register(
    "feat_scale_robust",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority AS prio,
             min(o_totalprice) AS mn,
             max(o_totalprice) AS mx,
             quantile_cont(o_totalprice, 0.25) AS p25,
             quantile_cont(o_totalprice, 0.50) AS p50,
             quantile_cont(o_totalprice, 0.75) AS p75
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o_orderpriority AS prio,
           round((o_totalprice - mn) / (mx - mn), 6) AS scaled_minmax,
           round((o_totalprice - p50) / (p75 - p25), 6) AS scaled_robust
    FROM orders JOIN stats ON o_orderpriority = stats.prio
    WHERE o_orderkey % 199 = 0
    """,
    tags=("features", "ml"),
)
def feat_scale_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max and robust (median/IQR) feature scaling — the
    outlier-tolerant normalizations feat_winsorize doesn't cover. Group
    stats (min/max + exact interpolated quantiles, the proven
    percentile==quantile_cont parity) reduce to one row per priority
    class and broadcast back onto the rows, so the per-row scaling is a
    map-side join — no second shuffle. The % 199 sample bounds the
    output; the scaled expressions are identical IEEE arithmetic on both
    engines. At 100 TB swap the exact quantiles for approx_percentile
    and keep the same two-phase broadcast shape."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("_q"),
    )
    stats = stats.select(
        "prio",
        "mn",
        "mx",
        F.element_at("_q", 1).alias("p25"),
        F.element_at("_q", 2).alias("p50"),
        F.element_at("_q", 3).alias("p75"),
    )
    return (
        o.filter(F.col("o_orderkey") % 199 == 0)
        .join(F.broadcast(stats), F.col("o_orderpriority") == F.col("prio"))
        .select(
            "o_orderkey",
            "prio",
            F.round(
                (F.col("o_totalprice") - F.col("mn")) / (F.col("mx") - F.col("mn")), 6
            ).alias("scaled_minmax"),
            F.round(
                (F.col("o_totalprice") - F.col("p50"))
                / (F.col("p75") - F.col("p25")),
                6,
            ).alias("scaled_robust"),
        )
    )
