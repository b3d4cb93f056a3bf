"""Time-series queries, part 2: seasonal decomposition and churn
labeling over the `events` table — the feature-engineering side of the
ts_* family (plans/timeseriesq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(extract(hour FROM ts) AS INT) AS hod
      FROM events
    ), seas AS (
      SELECT hod, round(avg(value), 6) AS seasonal,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM e GROUP BY 1
    )
    SELECT event_id, e.hod AS hod, value, seasonal, n_obs,
           round(value - seasonal, 6) AS residual
    FROM e JOIN seas ON e.hod = seas.hod
    WHERE event_id % 41 = 0
    """,
    tags=("timeseries",),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition with an hour-of-day profile:
    seasonal(h) = mean(value | hour=h), residual = value - seasonal.
    The seasonal mean is rounded to 6 before the subtraction so the
    residual is a deterministic per-row op on both engines (the avg is
    the one summation-order-sensitive aggregate, neutralized by the
    round per registry.py conventions).

    Plan: one 24-group aggregate (map-side partial, broadcast back onto
    the events scan — no shuffle of the fact side), then a narrow
    projection; output bounded by the event_id sample filter. Linear at
    any scale, and the seasonal profile table is O(24) forever.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.hour("ts").cast("int").alias("hod"),
    )
    seas = e.groupBy("hod").agg(
        F.round(F.avg("value"), 6).alias("seasonal"),
        F.count("*").cast("bigint").alias("n_obs"),
    )
    return (
        e.filter(F.col("event_id") % 41 == 0)
        .join(F.broadcast(seas), "hod")
        .select(
            "event_id",
            "hod",
            "value",
            "seasonal",
            "n_obs",
            F.round(F.col("value") - F.col("seasonal"), 6).alias("residual"),
        )
    )


@register(
    "ts_churn_label",
    oracle="""
    WITH mx AS (SELECT max(ts) AS corpus_end FROM events),
    u AS (
      SELECT user_id,
             max(ts) AS last_seen,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
      FROM events GROUP BY 1
    )
    SELECT user_id,
           strftime(last_seen, '%Y-%m-%d %H:%M:%S') AS last_seen,
           n_events, active_days,
           CAST(date_diff('day', CAST(last_seen AS DATE),
                          CAST(corpus_end AS DATE)) AS BIGINT)
             AS days_silent,
           last_seen < corpus_end - INTERVAL 7 DAY AS churned
    FROM u CROSS JOIN mx
    """,
    tags=("timeseries", "ml"),
)
def ts_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn labeling for a training set: a user is churned if silent
    for the last 7 days of the observation window (window end = corpus
    max(ts), so the label is self-contained and reproducible).

    Plan: one groupBy(user_id) pass for recency/frequency features, the
    corpus end as a broadcast scalar. At 100 TB this is the canonical
    map-side-partial aggregate; no per-user data ever co-locates beyond
    the partial rows. Timestamps are exported as formatted strings per
    registry.py conventions.
    """
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("corpus_end"))
    u = e.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days"),
    )
    return u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        "n_events",
        "active_days",
        F.datediff(
            F.col("corpus_end").cast("date"), F.col("last_seen").cast("date")
        )
        .cast("bigint")
        .alias("days_silent"),
        (
            F.col("last_seen")
            < F.col("corpus_end") - F.expr("INTERVAL 7 DAYS")
        ).alias("churned"),
    )


@register(
    "ts_business_days",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, o_orderdate, l_shipdate,
             datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
               AS j0,
             datediff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE))
               AS j1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey % 51 = 0
    )
    SELECT l_orderkey, l_linenumber,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(j1 - j0 AS BIGINT) AS calendar_days,
           CAST((j1 // 7 * 5 + least(j1 % 7, 5))
                - (j0 // 7 * 5 + least(j0 % 7, 5)) AS BIGINT)
             AS business_days
    FROM li
    """,
    tags=("timeseries", "fn"),
)
def ts_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days (Mon-Fri) between order and ship date in O(1) per
    row — no per-day explode: g(d) = (j DIV 7)*5 + least(j mod 7, 5)
    counts business days from a fixed Monday epoch (1970-01-05) to d,
    so BD[a, b) = g(b) - g(a). The closed form is what survives scale;
    the generate_series-per-row alternative multiplies the row count by
    the average date span.

    Plan: broadcast-eligible orders side after the keyed sample filter,
    then pure codegen arithmetic; date keys stay integers throughout.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 51 == 0
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    epoch_monday = F.lit("1970-01-05").cast("date")
    j0 = F.datediff(F.col("o_orderdate").cast("date"), epoch_monday)
    j1 = F.datediff(F.col("l_shipdate").cast("date"), epoch_monday)
    g0 = (j0 - F.pmod(j0, 7)) / 7 * 5 + F.least(F.pmod(j0, 7), F.lit(5))
    g1 = (j1 - F.pmod(j1, 7)) / 7 * 5 + F.least(F.pmod(j1, 7), F.lit(5))
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        (j1 - j0).cast("bigint").alias("calendar_days"),
        (g1 - g0).cast("bigint").alias("business_days"),
    )


@register(
    "ts_anomaly_deseasonal",
    oracle="""
    WITH e AS (
      SELECT event_id, value, CAST(extract(hour FROM ts) AS INT) AS hod
      FROM events
    ), seas AS (
      SELECT hod, round(avg(value), 6) AS seasonal FROM e GROUP BY 1
    ), resid AS (
      SELECT event_id, e.hod AS hod, value,
             round(value - seasonal, 6) AS residual
      FROM e JOIN seas ON e.hod = seas.hod
    ), med AS (
      SELECT round(median(residual), 6) AS med FROM resid
    ), mad AS (
      SELECT round(median(abs(residual - med)), 6) AS mad, med
      FROM resid CROSS JOIN med GROUP BY med
    )
    SELECT event_id, hod, value, residual,
           round(abs(residual - med) / (mad * 1.4826), 6) AS robust_z
    FROM resid CROSS JOIN mad
    WHERE abs(residual - med) / (mad * 1.4826) > 3.5
    """,
    tags=("timeseries", "dq"),
)
def ts_anomaly_deseasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the DESEASONALIZED series: remove the
    hour-of-day profile (ts_seasonal_decompose above), then flag
    robust-z outliers on the residuals (MAD-scaled, threshold 3.5 —
    the Iglewicz-Hoaglin cut). Running MAD on raw values instead
    (anomaly_mad, plans/analytics4q.py) flags every seasonal peak;
    deseasonalizing first is what makes the monitor usable on cyclic
    metrics.

    Exact-ness: the seasonal means, the residual median, and the MAD
    are each rounded to 6 BEFORE dependent arithmetic (freeze-then-
    compare); medians are exact percentile_cont duals on both engines
    over the same rounded residuals. Plan: a 24-group profile
    broadcast, then two scalar robust aggregates, then a codegen
    filter — three passes, all linear, no window.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "value", F.hour("ts").cast("int").alias("hod")
    )
    seas = e.groupBy("hod").agg(F.round(F.avg("value"), 6).alias("seasonal"))
    resid = e.join(F.broadcast(seas), "hod").select(
        "event_id",
        "hod",
        "value",
        F.round(F.col("value") - F.col("seasonal"), 6).alias("residual"),
    )
    med = resid.agg(
        F.round(F.expr("percentile(residual, 0.5)"), 6).alias("med")
    )
    mad = (
        resid.crossJoin(F.broadcast(med))
        .agg(
            F.round(F.expr("percentile(abs(residual - med), 0.5)"), 6).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    rz = F.abs(F.col("residual") - F.col("med")) / (F.col("mad") * F.lit(1.4826))
    return (
        resid.crossJoin(F.broadcast(mad))
        .filter(rz > 3.5)
        .select(
            "event_id",
            "hod",
            "value",
            "residual",
            F.round(rz, 6).alias("robust_z"),
        )
    )
