"""Round-8 wave F: inter-annotator agreement and revenue inequality.

- ``eval_cohen_kappa``: Cohen's kappa between two synthetic annotators
  (event_id div 2 is the item, event_id % 2 the annotator, event_type
  the label; only double-labeled items count). The kappa algebra
  collapses to a SINGLE division of exact integers:
      kappa = (N * A - S) / (N^2 - S),  S = sum_l row_l * col_l
  where A is the agreement count and row/col the annotators' marginal
  label counts — so the output is BIGINT-exact on both engines.
- ``analytics_gini``: Gini coefficient of customer revenue via the rank
  formula G = (2*sum(r_i x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) over
  integer CENTS with a deterministic total order (revenue, custkey) —
  every term exact BIGINT, one final rounded division to micro-units.
  Tied revenues use rank-by-key order rather than midrank averaging —
  a frozen deterministic variant (bias < 1/n per tie run), documented
  so both engines replay it identically.

Reference parity: none of this exists in the reference (task.ts has no
eval/analytics surface) — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.prefix import with_global_order
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# eval_cohen_kappa
# --------------------------------------------------------------------------

_KAPPA_SQL = """
    WITH lab AS (
      SELECT event_id // 2 AS item, event_id % 2 AS annot, event_type AS label
      FROM events
    ),
    pairs AS (
      SELECT a.item, a.label AS label_a, b.label AS label_b
      FROM (SELECT * FROM lab WHERE annot = 0) a
      JOIN (SELECT * FROM lab WHERE annot = 1) b ON b.item = a.item
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(count(*) FILTER (WHERE label_a = label_b) AS BIGINT)
                   AS n_agree
          FROM pairs),
    marg AS (
      SELECT ra.label, ra.ra, rb.rb
      FROM (SELECT label_a AS label, CAST(count(*) AS BIGINT) AS ra
            FROM pairs GROUP BY 1) ra
      JOIN (SELECT label_b AS label, CAST(count(*) AS BIGINT) AS rb
            FROM pairs GROUP BY 1) rb ON rb.label = ra.label
    ),
    s AS (SELECT CAST(sum(ra * rb) AS BIGINT) AS s FROM marg)
    SELECT n_items, n_agree, s AS chance_sum,
           CAST(round((n_items * n_agree - s) * 1000000.0
                      / (n_items * n_items - s)) AS BIGINT) AS kappa_micro
    FROM n CROSS JOIN s
"""


@register("eval_cohen_kappa", oracle=_KAPPA_SQL, tags=("eval", "stats"))
def eval_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two annotators reconstructed from the event
    stream (item = event_id div 2, annotator = event_id % 2, label =
    event_type; items labeled by both sides only). kappa =
    (p_o - p_e)/(1 - p_e) multiplied through by N^2 becomes
    (N*A - S)/(N^2 - S) with S = sum of row*column marginal products —
    all BIGINT — so the single float op is one rounded division.

    Plan shape: one scan split into the two annotator sides, an
    equi-join on item (near-unique key, no skew), one count/filter agg
    and one |labels|-sized marginal join. At 100 TB the item join is
    the only shuffle and both aggregates reduce map-side. Inner join on
    the label marginals is total (both sides range over labels present
    in pairs). Bigint headroom: N*A <= N^2, exact through N ~ 3e9
    double-labeled items."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        F.expr("event_id div 2").alias("item"),
        (F.col("event_id") % 2).alias("annot"),
        F.col("event_type").alias("label"),
    )
    a = lab.filter(F.col("annot") == 0).select("item", F.col("label").alias("label_a"))
    b = lab.filter(F.col("annot") == 1).select("item", F.col("label").alias("label_b"))
    pairs = a.join(b, "item")
    n = pairs.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    ra = pairs.groupBy(F.col("label_a").alias("label")).agg(
        F.count("*").cast("bigint").alias("ra")
    )
    rb = pairs.groupBy(F.col("label_b").alias("label")).agg(
        F.count("*").cast("bigint").alias("rb")
    )
    s = (
        ra.join(rb, "label")
        .agg(F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("s"))
    )
    return n.crossJoin(s).select(
        "n_items",
        "n_agree",
        F.col("s").alias("chance_sum"),
        F.round(
            (F.col("n_items") * F.col("n_agree") - F.col("s"))
            * 1000000.0
            / (F.col("n_items") * F.col("n_items") - F.col("s"))
        )
        .cast("bigint")
        .alias("kappa_micro"),
    )


# --------------------------------------------------------------------------
# analytics_gini
# --------------------------------------------------------------------------

_GINI_SQL = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS r
      FROM rev
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s0,
             CAST(sum(r * cents) AS BIGINT) AS s1
      FROM ranked
    )
    SELECT n, s0, s1,
           CAST(round((2 * s1 - (n + 1) * s0) * 1000000.0 / (n * s0))
                AS BIGINT) AS gini_micro
    FROM agg
"""


@register("analytics_gini", oracle=_GINI_SQL, tags=("analytics", "stats"))
def analytics_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue (integer cents): the
    rank formula G = (2*sum(r*x) - (n+1)*sum(x)) / (n*sum(x)) over a
    deterministic (cents, custkey) total order. All three aggregates
    are exact BIGINTs; one rounded division publishes micro-units.
    Tie handling is rank-by-key (frozen variant; see module docstring).

    Plan shape: revenue groupBy (fact-scale, partial agg) -> global rank
    via the range-partitioned prefix-rank construction
    (operators/prefix.py: range shuffle + partitioned windows + an O(P)
    offset collect — NO unpartitioned WindowExec anywhere, the same
    construction cust_rfm_segments_dist uses) -> single-row reduce.
    Ranks are therefore partition-parallel at any customer count; the
    hash match against the oracle's global row_number proves the offset
    algebra reproduces it exactly. Bigint headroom:
    s1 <= n * s0, so 2*s1 stays int64-exact while n * s0 < 4.6e18; the
    sf fixtures sit at n <= 1e5, s0 <= 1e12 (s1 <= 1e17). Past that —
    e.g. 1e8 customers averaging 1e6 cents — move the s1 accumulator to
    the DECIMAL(38,0) ladder, as ml_decision_stump's purity sums do."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked = with_global_order(rev, ["cents", "o_custkey"], rn_col="r").select(
        "cents", "r"
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s0"),
        F.sum(F.col("r") * F.col("cents")).cast("bigint").alias("s1"),
    )
    return agg.select(
        "n",
        "s0",
        "s1",
        F.round(
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("s0"))
            * 1000000.0
            / (F.col("n") * F.col("s0"))
        )
        .cast("bigint")
        .alias("gini_micro"),
    )
