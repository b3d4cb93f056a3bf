"""Time-series rollup queries (hypertable-style continuous aggregates)
over the events table — minute/hour/day grains where each coarser grain
is computed from the finer grain's partials (operators/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators import timeseries as TS
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "rollup_timeseries",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    g AS (
      SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket,
             event_type, vc FROM c
      UNION ALL
      SELECT 'hour', date_trunc('hour', ts), event_type, vc FROM c
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, vc FROM c
    )
    SELECT grain, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           round(CAST(sum(vc) AS BIGINT) / 100.0, 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n,
           min(vc) / 100.0 AS min_value,
           max(vc) / 100.0 AS max_value,
           round(CAST(sum(vc) AS BIGINT) / 100.0 / count(*), 6) AS avg_value
    FROM g
    GROUP BY grain, bucket, event_type
    """,
    tags=("timeseries", "agg"),
)
def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup: minute partials from raw events, hour from
    minute, day from hour (sum-of-sums / count-of-counts / min-of-mins).
    The raw table is scanned ONCE; the oracle recomputes each grain from
    raw directly — equality proves the partial-compose path is lossless.

    The measure is rolled up in integer CENTS (value is 2-decimal): a
    double sum's last bits depend on partial-aggregation order, so a
    6-decimal rounding of sum/n can flip between runs with different
    partitioning; integer sums are order-independent and exact, and the
    dollar outputs are reconstructed with the identical expression on
    both engines. The reference has no time-series ops (SURVEY.md §2.C
    streaming scope); this is the continuous-aggregate shape a 100 TB
    event store needs."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    hier = TS.rollup_hierarchy(ev, "ts", ("event_type",), "vc")
    return hier.select(
        "grain",
        "bucket",
        "event_type",
        F.round(F.col("sum_value") / 100.0, 2).alias("sum_value"),
        "n",
        (F.col("min_value") / 100.0).alias("min_value"),
        (F.col("max_value") / 100.0).alias("max_value"),
        F.round(F.col("sum_value") / 100.0 / F.col("n"), 6).alias("avg_value"),
    )


@register(
    "funnel_stages",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
       AND CAST(e.ts AS TIMESTAMP) > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
       AND CAST(e.ts AS TIMESTAMP) > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS first_view,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS first_click_after,
           strftime(t3, '%Y-%m-%d %H:%M:%S') AS first_purchase_after
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    """,
    tags=("timeseries", "funnel", "join"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (view → click → purchase) per user:
    each stage's timestamp is the first qualifying event strictly after
    the previous stage's — the order-dependent semantics that a naive
    per-type min cannot express. Three user-keyed aggregate+join rounds;
    every shuffle is on user_id, so AQE reuses one exchange layout."""
    from pyspark.sql import functions as SF

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(SF.col("event_type") == "view")
        .groupBy("user_id")
        .agg(SF.min("ts").alias("t1"))
    )
    c = (
        ev.filter(SF.col("event_type") == "click")
        .join(v, "user_id")
        .filter(SF.col("ts") > SF.col("t1"))
        .groupBy("user_id")
        .agg(SF.min("ts").alias("t2"))
    )
    p = (
        ev.filter(SF.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(SF.col("ts") > SF.col("t2"))
        .groupBy("user_id")
        .agg(SF.min("ts").alias("t3"))
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            SF.when(SF.col("t3").isNotNull(), 3)
            .when(SF.col("t2").isNotNull(), 2)
            .when(SF.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
            SF.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("first_view"),
            SF.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("first_click_after"),
            SF.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias(
                "first_purchase_after"
            ),
        )
    )

@register(
    "ts_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    d AS (
      SELECT user_id, vc,
             (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
              - us) // 1000 AS dt_ms
      FROM o
    )
    SELECT user_id,
           round(CAST(sum(vc * dt_ms) AS BIGINT)
                 / (100.0 * CAST(sum(dt_ms) AS BIGINT)), 6) AS twa,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM d
    WHERE dt_ms IS NOT NULL
    GROUP BY user_id
    HAVING CAST(sum(dt_ms) AS BIGINT) > 0
    """,
    tags=("timeseries", "window", "agg"),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series — the irregular-sampling average a
    hypertable engine exposes: each observation is weighted by how long it
    stayed current (sum(value*dt)/sum(dt) over lead(ts) segments; the last
    observation of a series carries no weight). Value rides in integer
    CENTS and dt in integer MILLISECONDS so the weighted sum is an exact
    BIGINT reduction (order-independent — SCALE.md round-2 findings); the
    dollar TWA is reconstructed once at the end, identically on both
    engines. Magnitudes: cents<=5e4, dt_ms<=~3e9, ~1e2 segments/user →
    sums ~1e15 << 2^63. One window + one groupBy, both keyed on user_id —
    a single exchange at scale. The reference has no time-series surface;
    this extends SURVEY.md §2.C analytics scope."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .withColumn("dt_us", F.lead("us").over(w) - F.col("us"))
        # integer `div`, not double /1000: a double quotient can round up
        # across the truncation boundary; DuckDB's // floors exactly.
        .withColumn("dt_ms", F.expr("dt_us div 1000"))
    )
    return (
        d.filter(F.col("dt_ms").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("vc") * F.col("dt_ms")).alias("_wsum"),
            F.sum("dt_ms").alias("_dt"),
            F.count("*").alias("n_segments"),
        )
        .filter(F.col("_dt") > 0)
        .select(
            "user_id",
            F.round(F.col("_wsum") / (F.lit(100.0) * F.col("_dt")), 6).alias(
                "twa"
            ),
            "n_segments",
        )
    )


@register(
    "ts_gapfill_locf",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, min(b) AS mn, max(b) AS mx FROM h GROUP BY 1
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b
      FROM r
    ),
    j AS (
      SELECT s.event_type, s.b, h.sv, h.n FROM spine s
      LEFT JOIN h ON s.event_type = h.event_type AND s.b = h.b
    ),
    f AS (
      SELECT event_type, b, (sv IS NULL) AS is_gap,
             last_value(sv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_f,
             last_value(n IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_f
      FROM j
    )
    SELECT event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
           round(sv_f / (100.0 * n_f), 6) AS avg_value, is_gap
    FROM f
    """,
    tags=("timeseries", "window"),
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last-observation-carried-forward — the hypertable
    `time_bucket_gapfill` + `locf` shape: per-series hourly aggregates are
    joined onto a dense per-series hour spine (sequence() of the series'
    own min..max hour) and empty hours inherit the previous hour's
    aggregate via last(ignorenulls) — sum and count carried from the SAME
    source row, so the reconstructed avg is a real historical value, never
    a mix. The spine is generated per GROUP (5 types x ~720 hours — tiny
    vs the fact table) so no global collect; at 100 TB the spine explode
    is O(series x buckets), independent of event count, and the fill
    window shuffles once on the series key. Aggregates ride as integer
    cents (exact reduction); avg is reconstructed once at the end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.withColumn("b", F.date_trunc("hour", F.col("ts")))
        .withColumn("vc", F.round(F.col("value") * 100, 0).cast("bigint"))
        .groupBy("event_type", "b")
        .agg(F.sum("vc").alias("sv"), F.count("*").alias("n"))
    )
    spine = (
        h.groupBy("event_type")
        .agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("b"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = spine.join(h, ["event_type", "b"], "left")
    return (
        j.withColumn("is_gap", F.col("sv").isNull())
        .withColumn("sv_f", F.last("sv", ignorenulls=True).over(w))
        .withColumn("n_f", F.last("n", ignorenulls=True).over(w))
        .select(
            "event_type",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.round(F.col("sv_f") / (F.lit(100.0) * F.col("n_f")), 6).alias(
                "avg_value"
            ),
            "is_gap",
        )
    )


@register(
    "win_pattern_purchase_error",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type, us, ts_s,
             lead(event_type) OVER w AS next_type,
             lead(us) OVER w AS next_us,
             lead(ts_s) OVER w AS next_ts_s
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT user_id, ts_s AS purchase_ts, next_ts_s AS error_ts,
           (next_us - us) // 1000000 AS gap_seconds
    FROM seq
    WHERE event_type = 'purchase' AND next_type = 'error'
      AND next_us - us <= 600000000
    """,
    tags=("timeseries", "window", "pattern"),
)
def win_pattern_purchase_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): find a
    purchase IMMEDIATELY followed by an error for the same user within
    10 minutes — the adjacent-pair special case that one lead() window
    expresses without a self-join. Longer patterns chain more lead()
    columns or fall back to the funnel_stages join shape. One shuffle on
    the series key; the gap rides as exact integer microseconds."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )
    seq = o.select(
        "user_id",
        "event_type",
        "us",
        "ts_s",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("us").over(w).alias("next_us"),
        F.lead("ts_s").over(w).alias("next_ts_s"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("next_type") == "error")
            & (F.col("next_us") - F.col("us") <= 600_000_000)
        )
        .withColumn("gap_us", F.col("next_us") - F.col("us"))
        .select(
            "user_id",
            F.col("ts_s").alias("purchase_ts"),
            F.col("next_ts_s").alias("error_ts"),
            F.expr("gap_us div 1000000").alias("gap_seconds"),
        )
    )


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
      FROM events WHERE user_id % 10 = 0
    ),
    obs AS (
      SELECT user_id, h, round(avg(value), 6) AS v FROM ev GROUP BY 1, 2
    ),
    rng AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM rng
    ),
    j AS (
      SELECT g.user_id, g.h, o.v
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
    ),
    f AS (
      SELECT user_id, h, v,
             last_value(v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS prev_h,
             first_value(v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wn AS next_h
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN v IS NOT NULL THEN v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(date_diff('hour', prev_h, h) AS DOUBLE)
                        / CAST(date_diff('hour', prev_h, next_h) AS DOUBLE))
           END AS value,
           (v IS NULL) AS interpolated
    FROM f
    """,
    tags=("timeseries", "gapfill"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill on an hourly grid — the numeric
    sibling of ts_gapfill_locf: missing hours get the straight line
    between the surrounding observations instead of the previous value.

    Construction: hourly averages (rounded once so both engines
    interpolate from identical doubles) -> per-key sequence() grid
    explode -> one window pass computing prev/next observation via
    IGNORE NULLS last/first -> exact integer hour-distance ratio.
    Boundaries always exist because the grid spans each key's own
    [min, max] observed hour.

    Scale: the grid explode is O(span/grain) per key and the single
    window shuffle is keyed by user — no join against a global calendar
    table; each key's timeline stays in one partition. The user_id % 10
    filter is the sf0.01 oracle-size guard, not part of the operator."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select("user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    )
    obs = ev.groupBy("user_id", "h").agg(F.round(F.avg("value"), 6).alias("v"))
    rng = obs.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    # r15 optimization: AQE coalesces the tiny per-user (h0, h1) shuffle
    # to ~1 partition, and everything downstream — the span/grain grid
    # explode, the gap join, BOTH ignore-nulls window passes — rode that
    # single partition (observed 1-task stages). An explicit hash
    # repartition on user_id ahead of the explode spreads the expansion
    # across the cluster AND already satisfies the windows' required
    # ClusteredDistribution(user_id), so no extra exchange is added
    # below. Result-identical: windows sort within each user either way.
    grid = rng.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    ).select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(obs, ["user_id", "h"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    f = j.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("next_h"),
    )
    frac = F.expr("timestampdiff(HOUR, prev_h, h)").cast("double") / F.expr(
        "timestampdiff(HOUR, prev_h, next_h)"
    ).cast("double")
    return f.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        # no final round: the observed inputs are identically rounded on
        # both engines, so the interpolation expression (same op tree on
        # exact-int hour distances) is bit-identical — rounding HERE would
        # reintroduce half-boundary divergence, not remove it
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("value"),
        F.col("v").isNull().alias("interpolated"),
    )
