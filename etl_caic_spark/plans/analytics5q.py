"""Analytics queries, part 5: snapshot diffing (change-data generation),
last-touch marketing attribution, and calendar-dimension rollup with
zero-fill — warehouse staples not yet covered by the cdc_*/clickstream/
ts_* families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 100 <> 7
    ), v2 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 10 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 100 <> 13
    )
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v1.cents AS old_cents, v2.cents AS new_cents
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.cents <> v2.cents OR v1.o_orderstatus <> v2.o_orderstatus
    """,
    tags=("lakehouse", "cdc"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data generation by diffing two table snapshots (the
    inverse of cdc_apply_changes, plans/relational*): full outer join on
    the key, emit insert/delete/update rows, suppress unchanged ones.
    Snapshots are deterministic derivations of `orders` (v1 drops keys
    =7 mod 100; v2 drops =13 mod 100 and bumps every 10th price by $5).

    Plan: one shuffle on the join key for the full outer sort-merge —
    the minimal shape for whole-table diff. At 100 TB both snapshots
    would be bucketed/sorted by key on disk, turning this into a
    zero-shuffle zipper merge (the layout the layout_* and
    join_bucketed queries pin). Prices compared in integer cents.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    v1 = o.filter(F.col("o_orderkey") % 100 != 7).select(
        "o_orderkey", "o_orderstatus", cents.alias("cents")
    )
    v2 = o.filter(F.col("o_orderkey") % 100 != 13).select(
        "o_orderkey",
        "o_orderstatus",
        (
            cents
            + F.when(F.col("o_orderkey") % 10 == 0, F.lit(500)).otherwise(0)
        ).alias("cents"),
    )
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.o_orderkey") == F.col("v2.o_orderkey"), "full_outer"
    )
    return j.filter(
        F.col("v1.o_orderkey").isNull()
        | F.col("v2.o_orderkey").isNull()
        | (F.col("v1.cents") != F.col("v2.cents"))
        | (F.col("v1.o_orderstatus") != F.col("v2.o_orderstatus"))
    ).select(
        F.coalesce("v1.o_orderkey", "v2.o_orderkey").alias("o_orderkey"),
        F.when(F.col("v1.o_orderkey").isNull(), "insert")
        .when(F.col("v2.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("v1.cents").alias("old_cents"),
        F.col("v2.cents").alias("new_cents"),
    )


@register(
    "attrib_last_touch",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS) OVER w
               AS touch_id,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS) OVER w AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_id END
             AS touch_id,
           CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_type END
             AS touch_type,
           CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
                THEN CAST(date_diff('second', touch_ts, ts) AS BIGINT) END
             AS seconds_since_touch
    FROM ordered WHERE event_type = 'purchase'
    """,
    tags=("analytics", "clickstream"),
)
def attrib_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent preceding click/view within a 7-day lookback (NULL touch
    = unattributed/direct). The carry-forward is last_value(CASE...)
    IGNORE NULLS over (user, time) — all three touch columns ride the
    same window ordering so they come from the same touch row.

    Plan: one shuffle on user_id for the window sort; the purchase
    filter happens after the carry (it must see non-purchase rows).
    Per-user event streams are the partition unit — the natural key at
    any scale, same shape as sessionize_window. Tie-safe ordering via
    (ts, event_id).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    ordered = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    in_window = F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return ordered.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(in_window, F.col("touch_id")).alias("touch_id"),
        F.when(in_window, F.col("touch_type")).alias("touch_type"),
        F.when(
            in_window,
            (F.unix_timestamp("ts") - F.unix_timestamp("touch_ts")).cast("bigint"),
        ).alias("seconds_since_touch"),
    )


@register(
    "dim_calendar_rollup",
    oracle="""
    WITH span AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders
    ), cal AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1
    )
    SELECT CAST(year(day) AS INT) AS yr, CAST(quarter(day) AS INT) AS qtr,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(n_orders) AS BIGINT) AS n_active_days,
           CAST(coalesce(sum(n_orders), 0) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(revenue_cents), 0) AS BIGINT) AS revenue_cents
    FROM cal LEFT JOIN daily USING (day)
    GROUP BY 1, 2
    """,
    tags=("analytics", "timeseries"),
)
def dim_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation + zero-filled quarterly rollup:
    synthesize the full day spine between min and max order date
    (sequence+explode — no physical calendar table needed), left-join
    daily order aggregates onto it, and roll up to quarters so gaps
    (days with zero orders) still count toward n_days.

    Plan: the spine derives from a 2-row aggregate (broadcast), daily
    aggregates are one groupBy over the fact scan, and the spine-side
    left join broadcasts the DAILY aggregate (a few thousand rows per
    decade at any fact scale — the dimension, not the facts, rides the
    broadcast). Revenue in integer cents end-to-end.
    """
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )
    return (
        cal.join(F.broadcast(daily), "day", "left")
        .groupBy(
            F.year("day").cast("int").alias("yr"),
            F.quarter("day").cast("int").alias("qtr"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.count("n_orders").cast("bigint").alias("n_active_days"),
            F.coalesce(F.sum("n_orders"), F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.coalesce(F.sum("revenue_cents"), F.lit(0))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


def rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-grain RFM features (recency days vs corpus end, order
    count, integer-cents monetary) — shared by cust_rfm_segments and
    its scale twin."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("corpus_end"))
    return (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "corpus_end")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .select(
            "o_custkey",
            F.datediff(
                F.col("corpus_end").cast("date"), F.col("last_order").cast("date")
            )
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )


# Shared with the scale-safe twin cust_rfm_segments_dist (scalewinq.py):
# the twin hash-matches the SAME ntile SQL, proving the distributed rank
# construction reproduces the global windows bit-for-bit.
RFM_ORACLE = """
    WITH mx AS (SELECT max(o_orderdate) AS corpus_end FROM orders),
    base AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            CAST(corpus_end AS DATE)) AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders CROSS JOIN mx
      GROUP BY o_custkey, corpus_end
    ), scored AS (
      SELECT *,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
                  AS INT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
                  AS INT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
                  AS INT) AS m_score
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """


@register(
    "cust_rfm_segments",
    oracle=RFM_ORACLE,
    tags=("analytics",),
)
def cust_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order at the
    corpus end), frequency, monetary (integer cents), each quintiled by
    ntile(5) with a custkey tie-break so bucket boundaries are
    deterministic, then a rule-based segment label.

    Plan: one groupBy(custkey) pass for the three features, then three
    ntile windows. The windows are GLOBAL orderings — the honest cost
    of exact quantile ranks; at 100 TB you'd swap ntile for
    percentile-bucket joins against approx quantile boundaries
    (feat_bin_quantile, plans/mlq2.py, is that scale path) — this query
    pins the exact semantics the approximation must converge to
    (cust_rfm_segments_dist, plans/scalewinq.py, is that scale path —
    it hash-matches this query's oracle with partitioned windows only).
    """
    base = rfm_base(spark, sf_dir)
    scored = base.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey")))
        .cast("int")
        .alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular"),
    )


@register(
    "dq_freshness",
    oracle="""
    WITH mx AS (SELECT max(ts) AS corpus_end FROM events),
    per_type AS (
      SELECT event_type,
             max(ts) AS latest,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    )
    SELECT event_type,
           strftime(latest, '%Y-%m-%d %H:%M:%S') AS latest,
           n_events,
           CAST(date_diff('second', latest, corpus_end) AS BIGINT)
             AS staleness_sec,
           date_diff('second', latest, corpus_end) > 86400 AS stale
    FROM per_type CROSS JOIN mx
    """,
    tags=("dq", "timeseries"),
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness monitor: how far each event_type's latest
    record lags the corpus watermark, flagged stale past 24 h — the
    standard ingestion-health gate next to dq_volume_anomaly
    (plans/relational12.py).

    Plan: one map-side-partial groupBy over event_type (5 groups) plus
    a broadcast scalar watermark — a metadata-cost query even at
    100 TB, and with parquet footer statistics the max(ts) per
    partition can come from statistics alone (lakehouse_stats_skipping
    pins that path).
    """
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("corpus_end"))
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("latest"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    lag_sec = (
        F.unix_timestamp("corpus_end") - F.unix_timestamp("latest")
    ).cast("bigint")
    return per_type.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.date_format("latest", "yyyy-MM-dd HH:mm:ss").alias("latest"),
        "n_events",
        lag_sec.alias("staleness_sec"),
        (lag_sec > 86400).alias("stale"),
    )


@register(
    "mv_join_incremental",
    oracle="""
    WITH v2 AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 10 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 100 <> 13
    )
    SELECT n_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM v2
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
    tags=("lakehouse", "mv"),
)
def mv_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view — the delta
    algebra Δ(A⋈B) = ΔA⋈B when only A changes: the per-nation revenue
    MV is built from snapshot v1, then refreshed with ONLY the v1→v2
    change rows (same deterministic snapshots as snapshot_diff above;
    deletes contribute negative counts/cents, inserts positive, updates
    the difference), and the refreshed MV is returned.

    The oracle is the FULL recompute over v2 — the hash match IS the
    proof that incremental maintenance converges to the rebuild. Scale:
    the refresh cost is O(|Δ| join + |MV| merge), independent of |A| —
    the entire point of IVM at 100 TB; the dimension side broadcasts
    both in the base build and the delta apply. Groups whose counts
    cancel to zero are dropped in the merge (a nation all of whose
    orders were deleted leaves the MV, matching the rebuild).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    dim = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", "n_nationkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    v1 = o.filter(F.col("o_orderkey") % 100 != 7).select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    v2 = o.filter(F.col("o_orderkey") % 100 != 13).select(
        "o_orderkey",
        "o_custkey",
        (
            cents
            + F.when(F.col("o_orderkey") % 10 == 0, F.lit(500)).otherwise(0)
        ).alias("cents"),
    )
    mv_old = (
        v1.join(F.broadcast(dim), v1.o_custkey == dim.c_custkey)
        .groupBy("n_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    # Change rows as +/- deltas (delete: -old, insert: +new, update: both).
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    changes = j.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.cents") != F.col("b.cents"))
    )
    minus = changes.filter(F.col("a.o_orderkey").isNotNull()).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.lit(-1).alias("dn"),
        (-F.col("a.cents")).alias("dcents"),
    )
    plus = changes.filter(F.col("b.o_orderkey").isNotNull()).select(
        F.col("b.o_custkey").alias("o_custkey"),
        F.lit(1).alias("dn"),
        F.col("b.cents").alias("dcents"),
    )
    delta = (
        minus.unionByName(plus)
        .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
        .groupBy("n_nationkey")
        .agg(
            F.sum("dn").cast("bigint").alias("n_orders"),
            F.sum("dcents").cast("bigint").alias("revenue_cents"),
        )
    )
    return (
        mv_old.unionByName(delta)
        .groupBy("n_nationkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )


@register(
    "attrib_linear_multi_touch",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ), pt AS (
      SELECT purchase_id, p.user_id AS user_id, p_ts, touch_id, event_type,
             CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
               AS n_touches
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t_ts < p_ts AND t_ts >= p_ts - INTERVAL 7 DAY
    )
    SELECT purchase_id, user_id, touch_id,
           event_type AS touch_type, n_touches,
           round(1.0 / n_touches, 6) AS credit
    FROM pt
    """,
    tags=("analytics", "clickstream"),
)
def attrib_linear_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 7-day
    lookback before a purchase shares the credit equally (1/n per
    touch) — the fairness counterpart to attrib_last_touch above, and
    the shape that needs a RANGE JOIN rather than a window carry
    (last-touch needs only the latest predecessor; linear needs ALL of
    them as rows).

    Plan: user-equi join with the time-range predicate — Spark plans
    the equi part as the shuffle key and evaluates the range as a
    post-join filter, so cost is per-user purchases x touches within
    the window, the same profile as join_range; at 100 TB both sides
    bucket by user and sort by time, making this a per-bucket zipper.
    The per-purchase touch count rides one window over the join output.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("purchase_id")
    return joined.select(
        "purchase_id",
        "user_id",
        "touch_id",
        F.col("event_type").alias("touch_type"),
        F.count("*").over(w).cast("bigint").alias("n_touches"),
    ).withColumn("credit", F.round(F.lit(1.0) / F.col("n_touches"), 6))
