"""Round-10 wave F (file wave14f): Holt-Winters additive seasonal
smoothing — the seasonal member of the forecasting family.

The engine's smoothing ladder was LOCF/interpolation -> EWMA ->
Holt linear trend (ts_holt_linear, plans/wave8b.py); Holt-Winters adds
the seasonal component that real demand/traffic series need. Same
compilation strategy as Holt: with alpha = beta = gamma = 1/2 and
season length m = 7 (day-of-week), the recurrence
    l_t = (y_t - s_{t-m})/2 + (l_{t-1} + b_{t-1})/2
    b_t = (l_t - l_{t-1})/2 + b_{t-1}/2
    s_t = (y_t - l_t)/2 + s_{t-m}/2
is a LINEAR state-space, so the depth-truncated level/trend/seasonal
are CLOSED-FORM dot products over the lag chain. The coefficients are
computed once at import by simulating the recurrence in coefficient
space (zero init at lag depth, depth = 28 = four full seasons) and
inlined as literals via repr() — the identical double constants parse
on both engines (CAST('…' AS DOUBLE) on DuckDB, F.lit on Spark), and
the dot products add terms in the identical j = 0..depth order, so
results are bit-identical before the final display rounding. Unlike
Holt's depth-8 coefficients these are not guaranteed exact dyadic
rationals (denominators outgrow the 53-bit mantissa past ~depth 26);
that does not matter for cross-engine equality — only literal and
evaluation-order identity do — and the truncation itself is the
documented approximation (coefficient tail ~0.5^(depth/m) per season).

The series is the GLOBAL daily order revenue on a DENSIFIED day grid
(missing days are true zeros — a gap would silently shift the
day-of-week alignment of every s_{t-m} reference). The grid is
date-span-bounded (~2.4k rows regardless of fact size), so its single
ordered window sits in the documented bounded-domain class
(SCALE.md inventory); the fact table contributes one
map-side-combinable daily rollup. Output: the last 7 days, each with
level/trend, the seasonal index applying to its NEXT day, and the
one-step forecast l + b + s_{t+1-m}.

Reference parity: the reference (task.ts:88-189) has no forecasting
surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_HW_M = 7  # season length (day-of-week)
_HW_DEPTH = 28  # four full seasons of lag history


def _hw_coefficients(
    depth: int = _HW_DEPTH, m: int = _HW_M
) -> tuple[list[float], list[float], list[float]]:
    """Coefficients of y_{t-j} in the depth-truncated Holt-Winters
    level, trend, and NEXT-step seasonal (s_{t+1-m}, the index the
    one-step forecast uses), alpha = beta = gamma = 1/2, zero init."""
    zero = [0.0] * (depth + 1)
    lvl, trd = list(zero), list(zero)
    ring = [list(zero) for _ in range(m)]  # ring[0] = s_t, ring[m-1] = s_{t-m+1}
    for step in range(depth, -1, -1):  # feed y at lag `step`, oldest first
        s_season = ring[m - 1]  # s_{t-m} relative to the new step
        new_l = [
            0.5 * (lvl[j] + trd[j]) - 0.5 * s_season[j] for j in range(depth + 1)
        ]
        new_l[step] += 0.5
        new_b = [
            0.5 * (new_l[j] - lvl[j]) + 0.5 * trd[j] for j in range(depth + 1)
        ]
        new_s = [-0.5 * new_l[j] + 0.5 * s_season[j] for j in range(depth + 1)]
        new_s[step] += 0.5
        ring = [new_s] + ring[:-1]
        lvl, trd = new_l, new_b
    return lvl, trd, ring[m - 1]  # ring[m-1] = s_{t-m+1} = s applied at t+1


_HW_L, _HW_B, _HW_S = _hw_coefficients()


def _hw_dot_sql(coefs: list[float]) -> str:
    terms = [f"CAST('{coefs[0]!r}' AS DOUBLE) * y"]
    terms += [
        f"CAST('{coefs[j]!r}' AS DOUBLE) * coalesce(lag(y, {j}) OVER w, 0.0)"
        for j in range(1, len(coefs))
    ]
    return "(" + " + ".join(terms) + ")"


_HW_SQL = f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               AS y0
      FROM orders GROUP BY 1
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    grid AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    series AS (
      SELECT grid.day, coalesce(daily.y0, 0.0) AS y
      FROM grid LEFT JOIN daily ON daily.day = grid.day
    ),
    chain AS (
      SELECT day, y,
             {_hw_dot_sql(_HW_L)} AS lvl,
             {_hw_dot_sql(_HW_B)} AS trd,
             {_hw_dot_sql(_HW_S)} AS snx,
             row_number() OVER (ORDER BY day DESC) AS rn
      FROM series
      WINDOW w AS (ORDER BY day ASC)
    )
    SELECT day, CAST(y AS BIGINT) AS y_cents,
           round(lvl, 6) AS level_t,
           round(trd, 6) AS trend_t,
           round(snx, 6) AS season_next,
           round(lvl + trd + snx, 6) AS forecast_next
    FROM chain WHERE rn <= {_HW_M}
"""


@register("ts_holt_winters", oracle=_HW_SQL, tags=("timeseries", "window"))
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoother (module docstring:
    alpha=beta=gamma=1/2, m=7, depth-28 closed-form compilation) over
    the densified global daily revenue series; the last 7 days each
    report level, trend, the seasonal index for their next day, and
    the one-step forecast.

    Plan: one daily fact rollup (map-side combinable), a broadcast
    2-value span, a sequence-exploded bounded day grid, three dot
    products in a single bounded-domain window projection."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("double")
        .alias("y0")
    )
    span = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    series = grid.join(daily, "day", "left").select(
        "day", F.coalesce("y0", F.lit(0.0)).alias("y")
    )
    w = Window.orderBy(F.asc("day"))

    def dot(coefs: list[float]) -> Column:
        acc = F.lit(coefs[0]) * F.col("y")
        for j in range(1, len(coefs)):
            acc = acc + F.lit(coefs[j]) * F.coalesce(
                F.lag("y", j).over(w), F.lit(0.0)
            )
        return acc

    chain = series.select(
        "day",
        "y",
        dot(_HW_L).alias("lvl"),
        dot(_HW_B).alias("trd"),
        dot(_HW_S).alias("snx"),
        F.row_number().over(Window.orderBy(F.desc("day"))).alias("rn"),
    )
    return chain.where(F.col("rn") <= _HW_M).select(
        "day",
        F.col("y").cast("bigint").alias("y_cents"),
        F.round("lvl", 6).alias("level_t"),
        F.round("trd", 6).alias("trend_t"),
        F.round("snx", 6).alias("season_next"),
        F.round(F.col("lvl") + F.col("trd") + F.col("snx"), 6).alias(
            "forecast_next"
        ),
    )
