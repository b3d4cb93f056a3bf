"""Wave 29 (round 5): three analytics staples completing the
statistics/window families — a chi-square independence test over a
contingency table (the categorical-drift detector), an exact rolling
median (order statistics over a moving frame), and the Pareto cut
(smallest prefix of ranked items covering 80% of a total).

Exactness: observed counts are BIGINT; expected counts and the χ²
statistic are built from single divisions of exact integers with
identical expression trees; the rolling median picks a concrete element
(lower-median convention = DuckDB's quantile_disc(0.5)), so no
interpolation drift exists; Pareto uses cross-multiplied integer
comparisons, no ratio materialized for the cut decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.prefix import with_global_order
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "stat_chi_square",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS row_tot FROM obs GROUP BY 1),
    ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS col_tot FROM obs GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT obs.lang, obs.source, o,
             row_tot * col_tot / (n * 1.0) AS e
      FROM obs
      JOIN rt ON rt.lang = obs.lang
      JOIN ct ON ct.source = obs.source
      CROSS JOIN n
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((o - e) * (o - e) / e), 6) AS chi2,
           CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof
    FROM cells
    """,
    tags=("stats", "agg"),
)
def stat_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test for the lang×source contingency
    table — the categorical-drift detector (are sources language-biased?
    did the mix shift between snapshots?). Observed counts and margins
    are BIGINT-exact; each expected count is ONE division
    (row·col/N) and each cell's (O−E)²/E term uses the identical
    expression tree on both engines, so the summed statistic agrees to
    the rounded precision. Degrees of freedom ship alongside so the
    caller can threshold against the χ² distribution.

    Scale: one groupBy over the fact (map-side combinable) produces
    the |langs|×|sources| contingency table; margins and the statistic
    are computed on that tiny rollup — the fact table is scanned once.
    Because only observed cells are materialized, all-zero cells
    (absent pairs) contribute their E via the margins only if present;
    on this fixture every pair occurs, and the n_cells column makes
    that auditable."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("row_tot"))
    ct = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("col_tot"))
    n = obs.agg(F.sum("o").cast("bigint").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("row_tot") * F.col("col_tot") / (F.col("n") * 1.0))
    )
    n_rows = rt.count()
    n_cols = ct.count()
    return cells.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
        F.lit((n_rows - 1) * (n_cols - 1)).cast("bigint").alias("dof"),
    )


@register(
    "win_rolling_median",
    oracle="""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
           cents,
           CAST(quantile_disc(cents, 0.5) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_median_cents
    FROM pts
    """,
    tags=("window", "timeseries"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (lower-median convention) of purchase value
    over the trailing 7 observations per user — the robust moving
    signal a mean-based window can't give (one whale purchase drags a
    moving average for its whole frame; the median shrugs). Spark has
    no native median-over-frame, so the frame is materialized with
    collect_list over the window, sorted, and the lower-middle element
    picked — EXACTLY the element DuckDB's quantile_disc(0.5) window
    picks, so the oracle agrees without interpolation conventions.

    Scale: per-row frame materialization costs O(w log w) for frame
    width w=7 — fine for small frames; for wide frames the production
    answer is two-heap streaming percentile inside
    applyInPandasWithState or an approximate t-digest per frame
    (registered sibling: agg_approx_quantile). The window partitions
    by user — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    frame = F.sort_array(F.collect_list("cents").over(w))
    # lower median: 1-indexed element (n+1)//2 == quantile_disc(0.5)
    med = F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int"))
    return pts.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "cents",
        med.cast("bigint").alias("rolling_median_cents"),
    )


@register(
    "win_pareto_cut",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT l_partkey, rev_cents,
             CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_cents,
             CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents,
             CAST(row_number() OVER (ORDER BY rev_cents DESC, l_partkey)
                  AS BIGINT) AS rk
      FROM ranked
    )
    SELECT l_partkey, rk, rev_cents, cum_cents,
           round(cum_cents * 1.0 / total_cents, 6) AS cum_share
    FROM cum
    WHERE (cum_cents - rev_cents) * 5 < total_cents * 4
    """,
    tags=("window", "agg"),
)
def win_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto cut: the smallest prefix of parts, ranked by revenue,
    that covers 80% of total revenue — 'which SKUs are the business'.
    A part is kept iff the cumulative revenue BEFORE it is under the
    80% line (so the part crossing the line is included and the set is
    minimal). The cut test is CROSS-MULTIPLIED integers
    ((cum−rev)·5 < total·4) — exact, no ratio compared against a
    float threshold; the reported share is one rounded division.

    Scale: the ranking is over the PART-LEVEL rollup (|parts| rows ~
    10^8 at 100 TB), still far too many for a single-partition
    WindowExec — so the global rank AND the running revenue sum come
    from the partitioned prefix construction (operators/prefix.py:
    range-partition on the order key, per-partition local windows, a
    broadcast O(P) offset map), the same with_global_order algebra the
    four round-8 anchor queries were rewritten onto. Descending
    revenue is expressed as an ascending NEGATED column so the range
    partitioner and the local window share one sort direction. The
    grand total is a one-row aggregate cross-joined back (never a
    partitionBy() window); the fact-table aggregate is one
    map-side-combinable shuffle. No unpartitioned window remains
    anywhere in the plan (asserted by tests/test_scalewin_twins.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    ranked = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    total = ranked.agg(
        F.sum("rev_cents").cast("bigint").alias("total_cents")
    )
    cum = with_global_order(
        ranked.withColumn("neg_cents", -F.col("rev_cents")),
        ["neg_cents", "l_partkey"],
        rn_col="rk",
        cumsum_cols={"cum_cents": "rev_cents"},
    ).crossJoin(F.broadcast(total))
    return cum.where(
        (F.col("cum_cents") - F.col("rev_cents")) * 5
        < F.col("total_cents") * 4
    ).select(
        "l_partkey",
        "rk",
        "rev_cents",
        "cum_cents",
        F.round(F.col("cum_cents") * 1.0 / F.col("total_cents"), 6).alias(
            "cum_share"
        ),
    )
