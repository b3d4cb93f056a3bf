"""Round-9 wave J (file wave12a): expected calibration error and the
Friedman test — two family-completing statistics.

- ``eval_ece``: the single-number readout of eval_calibration_bins
  (mlq.py:242). The textbook ECE = sum_b (n_b/N)|acc_b - conf_b|
  looks float-laden, but multiplying through by 1000*N collapses it to
      ECE = sum_b |1000*pos_b - sum_p_milli_b| / (1000*N)
  — the absolute values sit over exact BIGINTs, so both engines agree
  digit-for-digit and ONE rounded division publishes micro-units.
- ``stat_friedman``: the repeated-measures companion to
  stat_kruskal_wallis (wave9a.py) — k=3 treatments (l_returnflag)
  ranked WITHIN each of the 7 blocks (l_linenumber) on the block's
  exact integer quantity mass, Q = 12/(nk(k+1)) * sum_j R_j^2
  - 3n(k+1). Within-block ranks use the frozen (value, treatment)
  total order (the registry's deterministic tie convention, documented
  like stat_spearman's); every moment is an exact BIGINT and the
  block-partitioned rank window runs over k-row partitions.

Reference parity: the reference (task.ts:88-189) has no stats/eval
surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# eval_ece
# --------------------------------------------------------------------------

_ECE_SQL = """
    WITH scored AS (
      SELECT CAST((vec_id * 37) % 1000 AS BIGINT) AS prob_milli,
             CAST(label % 2 AS BIGINT) AS y
      FROM embeddings
    ),
    bins AS (
      SELECT prob_milli // 100 AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS pos_b,
             CAST(sum(prob_milli) AS BIGINT) AS sum_p_b
      FROM scored GROUP BY 1
    )
    SELECT CAST(sum(n_b) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(abs(1000 * pos_b - sum_p_b)) AS BIGINT) AS abs_gap_milli,
           CAST(round(sum(abs(1000 * pos_b - sum_p_b)) * 1000000.0
                      / (1000.0 * sum(n_b))) AS BIGINT) AS ece_micro
    FROM bins
"""


@register("eval_ece", oracle=_ECE_SQL, tags=("ml", "eval", "agg"))
def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error over the 10 equal-width probability
    bins shared with eval_calibration_bins (module docstring: the
    1000*N multiplication keeps the per-bin gap |1000*pos - sum_p|
    an exact BIGINT — no per-bin float division ever happens). Two
    map-side-combinable aggregates; single-row output at any input
    size."""
    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        ((F.col("vec_id") * 37) % 1000).cast("bigint").alias("prob_milli"),
        (F.col("label") % 2).cast("bigint").alias("y"),
    )
    bins = scored.groupBy(F.expr("prob_milli div 100").alias("bin")).agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("pos_b"),
        F.sum("prob_milli").cast("bigint").alias("sum_p_b"),
    )
    return bins.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum(F.abs(1000 * F.col("pos_b") - F.col("sum_p_b")))
        .cast("bigint")
        .alias("abs_gap_milli"),
        F.round(
            F.sum(F.abs(1000 * F.col("pos_b") - F.col("sum_p_b")))
            * 1000000.0
            / (F.lit(1000.0) * F.sum("n_b"))
        )
        .cast("bigint")
        .alias("ece_micro"),
    )


# --------------------------------------------------------------------------
# stat_friedman
# --------------------------------------------------------------------------

_FRIEDMAN_SQL = """
    WITH cell AS (
      SELECT l_linenumber AS block, l_returnflag AS treat,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS v
      FROM lineitem
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT block, treat,
             CAST(row_number() OVER (PARTITION BY block
                                     ORDER BY v, treat) AS BIGINT) AS r
      FROM cell
    ),
    rj AS (
      SELECT treat, CAST(sum(r) AS BIGINT) AS r_j
      FROM ranked GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(r_j * r_j) AS BIGINT) AS rsq,
             (SELECT CAST(count(DISTINCT block) AS BIGINT) FROM cell) AS n
      FROM rj
    )
    SELECT n, k, rsq,
           CAST(round((12.0 * rsq / (CAST(n AS DOUBLE) * k * (k + 1.0))
                       - 3.0 * n * (k + 1.0)) * 1000000.0) AS BIGINT)
             AS q_micro
    FROM agg
"""


@register("stat_friedman", oracle=_FRIEDMAN_SQL, tags=("stats",))
def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman Q for the k=3 l_returnflag treatments ranked within the
    7 l_linenumber blocks on exact integer quantity mass (module
    docstring: frozen (value, treatment) tie order; rank windows are
    block-partitioned over k-row partitions — nothing row-scale is
    ever sorted; the fact scan is one map-side-combinable groupBy to
    the k x n cell grid)."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = li.groupBy(
        F.col("l_linenumber").alias("block"), F.col("l_returnflag").alias("treat")
    ).agg(
        F.sum(F.round(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    w = Window.partitionBy("block").orderBy("v", "treat")
    ranked = cell.select(
        "block", "treat", F.row_number().over(w).cast("bigint").alias("r")
    )
    rj = ranked.groupBy("treat").agg(F.sum("r").cast("bigint").alias("r_j"))
    nblocks = cell.agg(F.countDistinct("block").cast("bigint").alias("n"))
    agg = rj.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j")).cast("bigint").alias("rsq"),
    ).crossJoin(F.broadcast(nblocks))
    return agg.select(
        "n",
        "k",
        "rsq",
        F.round(
            (
                F.lit(12.0)
                * F.col("rsq")
                / (F.col("n").cast("double") * F.col("k") * (F.col("k") + F.lit(1.0)))
                - F.lit(3.0) * F.col("n") * (F.col("k") + F.lit(1.0))
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("q_micro"),
    )
