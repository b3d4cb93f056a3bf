"""Ninth wave (round 5): the full three-action MERGE (update + insert +
delete in one full-outer pass — completing the family started by
scd_upsert's two-action emulation and cdc_apply_changes' log collapse)
and the nearest-direction as-of join (pandas merge_asof
direction='nearest', the variant join_asof's backward search can't
express)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "merge_full",
    oracle="""
    WITH src AS (
      SELECT c_custkey AS k, 'D' AS op,
             NULL::DOUBLE AS new_bal, NULL::VARCHAR AS new_seg
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, 'U', round(c_acctbal + 500, 2), 'MERGED'
      FROM customer WHERE c_custkey % 7 = 1
      UNION ALL
      SELECT c_custkey + 2000000, 'I', 0.0, 'INSERTED'
      FROM customer WHERE c_custkey % 7 = 2
    )
    SELECT coalesce(b.c_custkey, s.k) AS c_custkey,
           coalesce(b.c_name, 'Customer#new') AS c_name,
           CASE WHEN s.op = 'U' THEN s.new_bal
                WHEN s.op = 'I' THEN s.new_bal
                ELSE round(b.c_acctbal, 2) END AS c_acctbal,
           CASE WHEN s.op = 'U' THEN s.new_seg
                WHEN s.op = 'I' THEN s.new_seg
                ELSE b.c_mktsegment END AS c_mktsegment
    FROM customer b FULL JOIN src s ON b.c_custkey = s.k
    WHERE s.k IS NULL
       OR (s.op = 'U' AND b.c_custkey IS NOT NULL)
       OR (s.op = 'I' AND b.c_custkey IS NULL)
    """,
    tags=("pipeline", "merge"),
)
def merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full three-action MERGE in ONE full-outer join pass: WHEN MATCHED
    AND op='D' THEN DELETE; WHEN MATCHED AND op='U' THEN UPDATE; WHEN NOT
    MATCHED AND op='I' THEN INSERT; unmatched base rows pass through.
    This is the physical plan a Delta/Iceberg MERGE lowers to (one
    key-shuffled join + per-row CASE), minus file-level pruning. The
    anti-join+union form (scd_upsert) re-shuffles twice; the full-outer
    form is the single-shuffle shape you want when most of the base is
    touched. Dangling actions (U on a missing key, D on a missing key)
    drop out — the same no-op semantics SQL MERGE gives them."""
    base = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    src = (
        base.filter(k % 7 == 0)
        .select(
            k.alias("k"),
            F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("new_bal"),
            F.lit(None).cast("string").alias("new_seg"),
        )
        .unionByName(
            base.filter(k % 7 == 1).select(
                k.alias("k"),
                F.lit("U").alias("op"),
                F.round(F.col("c_acctbal") + 500, 2).alias("new_bal"),
                F.lit("MERGED").alias("new_seg"),
            )
        )
        .unionByName(
            base.filter(k % 7 == 2).select(
                (k + 2000000).alias("k"),
                F.lit("I").alias("op"),
                F.lit(0.0).alias("new_bal"),
                F.lit("INSERTED").alias("new_seg"),
            )
        )
    )
    m = base.join(src, base["c_custkey"] == src["k"], "full_outer")
    matched = base["c_custkey"].isNotNull()
    # positive keep-conditions: NOT(op-based predicates) would go NULL on
    # base-only rows (op IS NULL) and silently drop them — 3VL again
    return (
        m.filter(
            F.col("k").isNull()
            | ((F.col("op") == "U") & matched)
            | ((F.col("op") == "I") & ~matched)
        )
        .select(
            F.coalesce(base["c_custkey"], F.col("k")).alias("c_custkey"),
            F.coalesce(F.col("c_name"), F.lit("Customer#new")).alias("c_name"),
            F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
            .otherwise(F.round("c_acctbal", 2))
            .alias("c_acctbal"),
            F.when(F.col("op").isin("U", "I"), F.col("new_seg"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), cand AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             c.event_id AS click_id,
             abs(date_diff('microseconds', c.ts, p.ts)) AS gap_us,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(date_diff('microseconds', c.ts, p.ts)), c.event_id
             ) AS rn
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL '1 hour'
       AND c.ts <= p.ts + INTERVAL '1 hour'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           cand.click_id, cand.gap_us
    FROM p LEFT JOIN cand
      ON cand.purchase_id = p.event_id AND cand.rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest' with a tolerance): each purchase pairs with the
    click closest in time, before OR after, within ±1h — ties broken by
    click id so the choice is total. Unmatched purchases survive with
    NULLs (left semantics).

    Scale: the tolerance bounds the candidate interval join (shuffles on
    user_id), and the per-purchase rank is a window over at most the
    clicks inside a 2h horizon — never a global sort. An unbounded
    nearest search would instead take the min over the backward and
    forward as-of results (two sorted passes, see operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    gap = F.abs(F.unix_micros("p_ts") - F.unix_micros("c_ts"))
    cand = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .withColumn("gap_us", gap)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("purchase_id").orderBy("gap_us", "click_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("purchase_id", "click_id", "gap_us")
    )
    return p.join(cand, "purchase_id", "left").select(
        "purchase_id", "user_id", "click_id", "gap_us"
    )


@register(
    "win_sliding_distinct",
    oracle="""
    WITH e AS (
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM e)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST((SELECT count(DISTINCT e.user_id) FROM e
                 WHERE e.day BETWEEN d.day - INTERVAL '6 days' AND d.day)
                AS BIGINT) AS n_active_7d,
           CAST((SELECT count(DISTINCT e.user_id) FROM e
                 WHERE e.day = d.day) AS BIGINT) AS n_active_1d
    FROM days d
    """,
    tags=("window", "distinct", "scale"),
)
def win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window EXACT distinct (7-day active users per day) via
    daily bitmaps — the composition of agg_bitmap_distinct with a RANGE
    window: one daily (day, key>>6) bitmap layer, then bit_or over the
    trailing 7-day RANGE frame per bucket and summed popcounts per day.
    A RANGE (not ROWS) frame keeps missing days correct.

    Why it matters at 100 TB: the naive form re-expands every (day,
    user) pair 7 times (or worse, re-scans 7 days per day); the bitmap
    form touches each event once, carries 8-byte cells, and the window
    input is |days| x |keys|/64 rows — the exact-count analogue of the
    'merge HLL sketches across time buckets' warehouse pattern. The
    oracle is an INDEPENDENT construction (correlated count-distinct
    ranges), so the equivalence is cross-checked, not replayed."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    bit = F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))")
    daily = ev.groupBy(
        "day", F.shiftright("user_id", 6).alias("bucket")
    ).agg(F.bit_or(bit).alias("bm"))
    day_num = F.datediff(F.col("day"), F.lit("2024-01-01"))
    w7 = (
        Window.partitionBy("bucket")
        .orderBy(day_num)
        .rangeBetween(-6, Window.currentRow)
    )
    slid = daily.select(
        "day",
        "bucket",
        F.bit_or("bm").over(w7).alias("bm7"),
        F.col("bm").alias("bm1"),
    )
    return slid.groupBy("day").agg(
        F.sum(F.bit_count("bm7")).alias("n_active_7d"),
        F.sum(F.bit_count("bm1")).alias("n_active_1d"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_active_7d",
        "n_active_1d",
    )


@register(
    "tpch_q7_shape",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
    tags=("headline", "join", "agg"),
)
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): a 6-way
    join where the 25-row nation dim joins TWICE under different roles
    and an OR-of-pairs predicate keeps both directions. Both nation
    joins broadcast; the OR predicate sits above them so Catalyst can
    still push the fact-side scan filters; the fact chain shuffles on
    orderkey then custkey exactly like Q10. Revenue in integer cents —
    order-independent group totals."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    cents = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    j = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
            cents,
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev_cents").alias("cs"))
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            (F.col("cs") / 100.0).alias("revenue"),
        )
    )


@register(
    "win_gaps_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                 AS DATE)) AS BIGINT) AS dn
      FROM events
    ),
    isl AS (
      SELECT user_id, dn,
             dn - row_number() OVER (PARTITION BY user_id ORDER BY dn)
               AS island
      FROM d
    ),
    streaks AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM streaks
    GROUP BY 1
    """,
    tags=("window", "sessionize"),
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over integer day numbers: consecutive-day
    activity streaks per user via the classic dn - row_number() island
    key (consecutive days share a constant difference). Sessionize
    (sessionize_window) groups by TIME gaps; this is the integer-
    sequence dual used for streak/retention analytics.

    Scale: one distinct + one user-keyed window + two aggregations, all
    shuffling on user_id once — AQE reuses the exchange. No joins, no
    self-comparison; the window frame is the default running frame."""
    d = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01"))
            .cast("bigint")
            .alias("dn"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dn")
    isl = d.select(
        "user_id", "dn", (F.col("dn") - F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest"),
        F.sum("len").alias("active_days"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS purchase_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      FROM events WHERE event_type = 'purchase' AND user_id < 10
    ),
    b AS (
      SELECT event_id AS error_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      FROM events WHERE event_type = 'error' AND user_id >= 140
    )
    SELECT a.purchase_id, b.error_id,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM a JOIN b ON a.s < b.e AND b.s < a.e
    """,
    tags=("join", "interval", "scale"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact interval-overlap join WITHOUT a shared key — the
    case neither an equi-join nor the broadcast theta join (join_range)
    covers at scale: 30-minute purchase windows of one user population
    against error episodes of a DISJOINT population. Each interval
    explodes to the 30-minute buckets it covers (<=2 here), the join is
    an equi-join on bucket, duplicate bucket hits collapse via distinct,
    and the exact open-interval predicate verifies. The 1-D sibling of
    geo_grid_join's bin-and-verify; the oracle is the quadratic
    all-pairs join.

    Scale: shuffle keys are time buckets, so co-occurring intervals
    co-locate; bucket width trades explode factor against bucket
    occupancy exactly like eps in the spatial grid. Overlap durations
    are exact integer microseconds (unix_micros == epoch_us)."""
    _W_US = 1_800_000_000  # 30 minutes
    ev = load_table(spark, sf_dir, "events")

    def intervals(etype, ufilter, idname):
        return (
            ev.filter((F.col("event_type") == etype) & ufilter)
            .select(
                F.col("event_id").alias(idname),
                F.unix_micros("ts").alias("s"),
                (F.unix_micros("ts") + _W_US).alias("e"),
            )
        )

    a = intervals("purchase", F.col("user_id") < 10, "purchase_id")
    b = intervals("error", F.col("user_id") >= 140, "error_id")

    def binned(df):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / _W_US),
                    F.floor((F.col("e") - 1) / _W_US),
                )
            ),
        )

    ba = binned(a).select("purchase_id", F.col("s").alias("a_s"),
                          F.col("e").alias("a_e"), "bucket")
    bb = binned(b).select("error_id", F.col("s").alias("b_s"),
                          F.col("e").alias("b_e"), "bucket")
    return (
        ba.join(bb, "bucket")
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .select(
            "purchase_id",
            "error_id",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_us"),
        )
        .distinct()
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total,
           CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))
                    * CAST(0.08 AS DECIMAL(4,2))) AS DOUBLE) AS tax
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "decimal"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math in DECIMAL end-to-end — the type surface every
    warehouse query uses for currency and the one place double rounding
    tricks are NOT needed: sums, max, and a fixed-point tax multiply all
    stay exact by construction, on both engines, at any summation order.
    The source doubles are 2-decimal prices, so the initial cast is
    exact. The final results cross the driver boundary as DOUBLE (the
    same convention timestamps use as formatted strings): every value is
    well under 2^53 at its scale, so the decimal->double conversion is
    exact and both engines emit identical bits — the decimal arithmetic
    itself stays the computation type.

    Scale: decimal aggregation partial-aggregates like longs (Spark
    stores small-precision decimals as unscaled longs in Tungsten); the
    cost over BIGINT cents is the wider overflow check, the benefit is
    schema-carried scale instead of convention-carried."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(12,2)")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(p).cast("double").alias("total"),
        F.max(p).cast("double").alias("max_price"),
        F.sum(p * F.lit("0.08").cast("decimal(4,2)"))
        .cast("double")
        .alias("tax"),
    )
