"""Round-10 wave C (file wave14c): Wilcoxon signed-rank and the
Kaplan-Meier product-limit estimator — the paired-test and survival
gaps in the statistics family.

- ``stat_wilcoxon_signed_rank``: the nonparametric battery covers
  independent groups (Mann-Whitney round6b, Kruskal-Wallis wave9a,
  Friedman wave12a) but had no PAIRED two-sample test. Pairs are each
  customer's spend before vs after 1998-01-01 (exact integer cents);
  zero differences drop per the standard procedure; |d| midranks come
  from counts cumulated over the DISTINCT-|d| frame — and since that
  grain grows with the data, the cumulation is the partitioned prefix
  construction (operators/prefix.py), not a global window. Midranks
  are carried DOUBLED (midrank_x2 = 2*cum_incl - cnt + 1) so ties'
  .5s stay integer; T+, mu and the tie-corrected variance are exact
  integers (x2 / x48 scalings), and the normal-approximation z is one
  frozen expression over them. Count cubes overflow int64 only past
  n ~ 2e6 pairs with heavy ties; the DECIMAL(38) ladder
  (eval_krippendorff_alpha's discipline) is the documented upgrade.

- ``stat_kaplan_meier``: the survival curve every churn/retention
  analysis starts from, over customer order-history lifetimes
  (duration = days from first to last order, inclusive; censored when
  the last order falls within 90 days of the corpus horizon — the
  customer may still be active). The survival function is published in
  LOG space as exact integer micro-nats:
      ln S(t) = sum_{death times t' <= t} [iln(n_t' - d_t') - iln(n_t')]
  (operators/micronat.py — integer at-risk/death counts feed ln, so
  the freeze is engine-portable; no cross-engine product of floats
  ever happens). The duration grid is DATE-SPAN-BOUNDED (~2.4k distinct
  days regardless of row count), so its two cumulations sit on the
  documented bounded-domain window class (SCALE.md inventory), not on
  a growing grain. n_t = d_t can only happen at the LAST death time
  (at-risk counts strictly decrease), where S hits exactly 0 — that
  row publishes NULL log-survival, guarded on both engines.

Reference parity: the reference (task.ts:88-189) has no statistics
surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.micronat import iln
from etl_caic_spark.operators.prefix import with_global_order
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_WSR_SPLIT = "1998-01-01"

_WSR_SQL = f"""
    WITH pc AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '{_WSR_SPLIT}'
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x_cents,
             CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '{_WSR_SPLIT}'
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y_cents
      FROM orders GROUP BY 1
    ),
    diffs AS (
      SELECT abs(y_cents - x_cents) AS absd,
             CASE WHEN y_cents > x_cents THEN 1 ELSE 0 END AS pos
      FROM pc WHERE y_cents <> x_cents
    ),
    ties AS (
      SELECT absd, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(pos) AS BIGINT) AS pos_cnt
      FROM diffs GROUP BY 1
    ),
    ranked AS (
      SELECT cnt, pos_cnt,
             CAST(sum(cnt) OVER (ORDER BY absd
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_incl
      FROM ties
    ),
    agg AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,
             CAST(sum(pos_cnt * (2 * cum_incl - cnt + 1)) AS BIGINT)
               AS t_plus_x2,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
      FROM ranked
    )
    SELECT n_pairs, t_plus_x2,
           CAST(n_pairs * (n_pairs + 1) // 2 AS BIGINT) AS mu_x2,
           CAST(2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_term
                AS BIGINT) AS var_x48,
           CASE WHEN 2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1)
                     - tie_term > 0
                THEN CAST(round(
                  ((t_plus_x2 - n_pairs * (n_pairs + 1) // 2) / 2.0)
                  / sqrt((2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1)
                          - tie_term) / 48.0) * 1000000) AS BIGINT)
           END AS z_micro
    FROM agg
"""


@register(
    "stat_wilcoxon_signed_rank", oracle=_WSR_SQL, tags=("stat", "eval")
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of per-customer spend before vs after
    1998-01-01 (module docstring: integer-cents pairs, doubled midranks
    from the partitioned prefix construction, exact T+/mu/variance with
    tie correction, one frozen z expression).

    Plan: one fact groupBy to pair the periods, one groupBy onto the
    distinct-|d| frame, with_global_order for the rank cumulation
    (range partition + O(P) offsets — no global window), a one-row
    reduce."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    post = F.col("o_orderdate") >= F.lit(_WSR_SPLIT).cast("timestamp")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.when(~post, cents).otherwise(0)).cast("bigint").alias("x_cents"),
        F.sum(F.when(post, cents).otherwise(0)).cast("bigint").alias("y_cents"),
    )
    diffs = pc.where(F.col("y_cents") != F.col("x_cents")).select(
        F.abs(F.col("y_cents") - F.col("x_cents")).alias("absd"),
        F.when(F.col("y_cents") > F.col("x_cents"), 1).otherwise(0).alias("pos"),
    )
    ties = diffs.groupBy("absd").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("pos_cnt"),
    )
    ranked = with_global_order(ties, ["absd"], cumsum_cols={"cum_incl": "cnt"})
    agg = ranked.agg(
        F.sum("cnt").cast("bigint").alias("n_pairs"),
        F.sum(
            F.col("pos_cnt") * (2 * F.col("cum_incl") - F.col("cnt") + 1)
        )
        .cast("bigint")
        .alias("t_plus_x2"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_term"),
    )
    # DECIMAL(38,0) for the cubic product (round-10 ADVICE): 2n(n+1)(2n+1)
    # exceeds int64 past n ~ 2e6 nonzero pairs, and non-ANSI Spark bigint
    # arithmetic would WRAP silently — decimal math stays exact to 1e38.
    # The published var_x48 column remains BIGINT for schema parity. A
    # bare decimal->bigint cast is NOT loud under non-ANSI Spark (it
    # returns NULL silently; only DuckDB errors — r11 ADVICE), so the
    # publish guard below raises explicitly past int64 rather than
    # relying on the oracle leg being run; z_micro is computed from the
    # exact decimal either way.
    n = F.col("n_pairs").cast("decimal(38,0)")
    var_x48 = 2 * n * (n + 1) * (2 * n + 1) - F.col("tie_term").cast(
        "decimal(38,0)"
    )
    var_x48_pub = F.when(
        var_x48 <= F.lit(9223372036854775807).cast("decimal(38,0)"),
        var_x48.cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("stat_wilcoxon_signed_rank: var_x48 exceeds int64: "),
                var_x48.cast("string"),
            )
        )
    )
    return agg.select(
        "n_pairs",
        "t_plus_x2",
        F.expr("n_pairs * (n_pairs + 1) div 2").cast("bigint").alias("mu_x2"),
        var_x48_pub.alias("var_x48"),
        F.when(
            var_x48 > 0,
            F.round(
                (
                    (
                        F.col("t_plus_x2")
                        - F.expr("n_pairs * (n_pairs + 1) div 2")
                    )
                    / 2.0
                )
                / F.sqrt(var_x48 / 48.0)
                * 1000000
            ).cast("bigint"),
        ).alias("z_micro"),
    )


_KM_HORIZON_DAYS = 90

_KM_SQL = f"""
    WITH span AS (
      SELECT o_custkey,
             CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS first_d,
             CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_d
      FROM orders GROUP BY 1
    ),
    hz AS (
      SELECT CAST(max(CAST(o_orderdate AS DATE)) AS DATE)
             - {_KM_HORIZON_DAYS} AS horizon
      FROM orders
    ),
    base AS (
      SELECT CAST(last_d - first_d + 1 AS BIGINT) AS duration_days,
             CASE WHEN last_d <= horizon THEN 1 ELSE 0 END AS event
      FROM span CROSS JOIN hz
    ),
    grid AS (
      SELECT duration_days, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(event) AS BIGINT) AS d
      FROM base GROUP BY 1
    ),
    risk AS (
      SELECT duration_days, cnt, d,
             (SELECT CAST(count(*) AS BIGINT) FROM base)
               - coalesce(CAST(sum(cnt) OVER (ORDER BY duration_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS n_risk
      FROM grid
    ),
    deaths AS (
      SELECT duration_days, n_risk, d AS n_events,
             CASE WHEN n_risk > d
                  THEN CAST(round(round(ln(n_risk - d), 6) * 1e6) AS BIGINT)
                       - CAST(round(round(ln(n_risk), 6) * 1e6) AS BIGINT)
                  ELSE 0 END AS delta,
             n_risk > d AS alive
      FROM risk WHERE d > 0
    )
    SELECT duration_days, n_risk, n_events,
           CASE WHEN alive
                THEN CAST(sum(delta) OVER (ORDER BY duration_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT)
           END AS logsurv_micronat
    FROM deaths
"""


@register("stat_kaplan_meier", oracle=_KM_SQL, tags=("stat", "ts"))
def stat_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of customer order-history lifetimes
    (module docstring: 90-day censoring horizon, log-space survival in
    exact integer micro-nats, NULL exactly where S(t) = 0).

    Plan: one fact groupBy to per-customer spans, a bounded-domain
    duration grid (~date-span days), two cumulations over that grid
    (documented bounded-window class — the grid cannot grow with the
    fact table), the horizon and total as broadcast one-row frames."""
    o = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    span = o.groupBy("o_custkey").agg(
        F.min(od).alias("first_d"), F.max(od).alias("last_d")
    )
    hz = o.agg(F.date_sub(F.max(od), _KM_HORIZON_DAYS).alias("horizon"))
    base = span.crossJoin(F.broadcast(hz)).select(
        (F.datediff("last_d", "first_d") + 1).cast("bigint").alias("duration_days"),
        F.when(F.col("last_d") <= F.col("horizon"), 1).otherwise(0).alias("event"),
    )
    grid = base.groupBy("duration_days").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("event").cast("bigint").alias("d"),
    )
    total = base.agg(F.count("*").cast("bigint").alias("n_total"))
    w_before = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = (
        grid.crossJoin(F.broadcast(total))
        .select(
            "duration_days",
            "cnt",
            "d",
            (
                F.col("n_total")
                - F.coalesce(F.sum("cnt").over(w_before).cast("bigint"), F.lit(0))
            ).alias("n_risk"),
        )
    )
    deaths = risk.where(F.col("d") > 0).select(
        "duration_days",
        "n_risk",
        F.col("d").alias("n_events"),
        F.when(
            F.col("n_risk") > F.col("d"),
            iln(F.col("n_risk") - F.col("d")) - iln(F.col("n_risk")),
        )
        .otherwise(F.lit(0))
        .alias("delta"),
        (F.col("n_risk") > F.col("d")).alias("alive"),
    )
    w_cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return deaths.select(
        "duration_days",
        "n_risk",
        "n_events",
        F.when(
            F.col("alive"), F.sum("delta").over(w_cum).cast("bigint")
        ).alias("logsurv_micronat"),
    )
