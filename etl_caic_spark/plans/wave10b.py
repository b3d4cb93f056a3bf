"""Round-9 wave F (file wave10b): Levene's variance-homogeneity test
and group-median imputation.

- ``stat_levene``: the assumption check that sits BETWEEN
  stat_anova_f and stat_kruskal_wallis in a real analysis — are the
  group variances equal enough for ANOVA? Levene's W (Brown-Forsythe
  median-centered variant) is the one-way ANOVA F statistic computed on
  z = |v - median(group)|. The group medians are exact integers from
  the bounded value histogram (LOWER median: smallest v with
  2*cum >= n — the same 2x-integer predicate as agg_weighted_median),
  so z is integer, every moment is an exact BIGINT, and the final W is
  the same pinned-group fixed-order scalar expression as stat_anova_f.
- ``feat_impute_median_group``: the feature-engineering step the
  registry's null-handling functions (fn_null_handling) stop short of —
  fill missing numerics with their GROUP's median and flag the fill.
  Missingness is synthesized deterministically (c_custkey % 13 == 0);
  the per-nation lower median comes from a nation-PARTITIONED rank
  window (partitioned — the 100 TB-safe window class) via the rank
  formula r == (n+1) div 2, and imputation is one broadcast join of the
  25-row median dim back onto the column.

Reference parity: the reference (task.ts:88-189) has no stats or
feature-engineering surface — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# stat_levene (Brown-Forsythe median-centered)
# --------------------------------------------------------------------------

_LEVENE_SQL = """
    WITH obs AS (
      SELECT l_returnflag AS grp, CAST(round(l_quantity) AS BIGINT) AS v
      FROM lineitem
    ),
    hist AS (
      SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY 1, 2
    ),
    cum AS (
      SELECT a.grp, a.v,
             CAST(sum(b.c) AS BIGINT) AS cum,
             CAST(min(t.n) AS BIGINT) AS n
      FROM hist a
      JOIN hist b ON b.grp = a.grp AND b.v <= a.v
      JOIN (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1) t
        ON t.grp = a.grp
      GROUP BY a.grp, a.v
    ),
    med AS (
      SELECT grp, CAST(min(v) AS BIGINT) AS m
      FROM cum WHERE 2 * cum >= n GROUP BY grp
    ),
    z AS (
      SELECT obs.grp, abs(obs.v - med.m) AS z
      FROM obs JOIN med ON med.grp = obs.grp
    ),
    g AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(z) AS BIGINT) AS s_i,
             CAST(sum(z * z) AS BIGINT) AS q_i
      FROM z GROUP BY 1
    ),
    piv AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(s_i) AS BIGINT) AS s,
             CAST(sum(q_i) AS BIGINT) AS q,
             CAST(sum(CASE WHEN grp = 'A' THEN s_i ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN grp = 'A' THEN n_i ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN grp = 'N' THEN s_i ELSE 0 END) AS BIGINT) AS sn,
             CAST(sum(CASE WHEN grp = 'N' THEN n_i ELSE 0 END) AS BIGINT) AS nn,
             CAST(sum(CASE WHEN grp = 'R' THEN s_i ELSE 0 END) AS BIGINT) AS sr,
             CAST(sum(CASE WHEN grp = 'R' THEN n_i ELSE 0 END) AS BIGINT) AS nr
      FROM g
    ),
    ss AS (
      SELECT n, n_groups,
             (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na
              + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / nn
              + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nr
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS ssb,
             (CAST(q AS DOUBLE)
              - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na
                 + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / nn
                 + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nr)) AS ssw
      FROM piv
    )
    SELECT n, n_groups,
           CAST(round((ssb / (n_groups - 1.0)) / (ssw / (n - n_groups * 1.0))
                      * 1000000.0) AS BIGINT) AS w_micro
    FROM ss
"""


@register("stat_levene", oracle=_LEVENE_SQL, tags=("stats",))
def stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene/Brown-Forsythe W for equality of l_quantity variances
    across the three pinned l_returnflag groups (module docstring:
    exact histogram medians -> integer |v - median| deviations -> the
    stat_anova_f pinned-pivot expression). The fact table is touched by
    one groupBy for the histogram and one for the deviation moments;
    everything between runs on the <= 3x50-row histogram."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity")).cast("bigint").alias("v"),
    )
    hist = li.groupBy("grp", "v").agg(F.count("*").cast("bigint").alias("c"))
    tot = hist.groupBy("grp").agg(F.sum("c").cast("bigint").alias("n"))
    a, b = hist.alias("a"), hist.alias("b")
    cum = (
        a.join(
            F.broadcast(b),
            (F.col("b.grp") == F.col("a.grp")) & (F.col("b.v") <= F.col("a.v")),
        )
        .groupBy(F.col("a.grp").alias("grp"), F.col("a.v").alias("v"))
        .agg(F.sum("b.c").cast("bigint").alias("cum"))
        .join(F.broadcast(tot), "grp")
    )
    med = (
        cum.filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("grp")
        .agg(F.min("v").cast("bigint").alias("m"))
    )
    z = li.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_i"),
        F.sum("z").cast("bigint").alias("s_i"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("q_i"),
    )

    def _pick(col: str, grp: str):
        return F.sum(F.when(F.col("grp") == grp, F.col(col)).otherwise(F.lit(0)))

    piv = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.sum("q_i").cast("bigint").alias("q"),
        _pick("s_i", "A").cast("bigint").alias("sa"),
        _pick("n_i", "A").cast("bigint").alias("na"),
        _pick("s_i", "N").cast("bigint").alias("sn"),
        _pick("n_i", "N").cast("bigint").alias("nn"),
        _pick("s_i", "R").cast("bigint").alias("sr"),
        _pick("n_i", "R").cast("bigint").alias("nr"),
    )

    def _sq(s: str, n: str):
        return (F.col(s).cast("double") * F.col(s).cast("double")) / F.col(n)

    within = _sq("sa", "na") + _sq("sn", "nn") + _sq("sr", "nr")
    ssb = within - _sq("s", "n")
    ssw = F.col("q").cast("double") - within
    return piv.select(
        "n",
        "n_groups",
        F.round(
            (ssb / (F.col("n_groups") - F.lit(1.0)))
            / (ssw / (F.col("n") - F.col("n_groups") * F.lit(1.0)))
            * 1000000.0
        )
        .cast("bigint")
        .alias("w_micro"),
    )


# --------------------------------------------------------------------------
# feat_impute_median_group
# --------------------------------------------------------------------------

_IMPUTE_SQL = """
    WITH base AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_custkey % 13 = 0 THEN NULL
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal_cents
      FROM customer
    ),
    present AS (
      SELECT c_nationkey, bal_cents,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY bal_cents, c_custkey) AS BIGINT)
               AS r,
             CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n
      FROM base WHERE bal_cents IS NOT NULL
    ),
    med AS (
      SELECT c_nationkey, CAST(min(bal_cents) AS BIGINT) AS med_cents
      FROM present WHERE r = (n + 1) // 2
      GROUP BY 1
    )
    SELECT b.c_custkey,
           b.bal_cents IS NULL AS was_missing,
           CAST(coalesce(b.bal_cents, m.med_cents) AS BIGINT) AS bal_cents
    FROM base b JOIN med m ON m.c_nationkey = b.c_nationkey
"""


@register("feat_impute_median_group", oracle=_IMPUTE_SQL, tags=("ml", "features", "quality"))
def feat_impute_median_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation with a fill flag: account balances are
    deterministically knocked out (c_custkey % 13 == 0) and refilled
    with their nation's LOWER median (the value at partitioned rank
    (n+1) div 2 of the present values — exact, no interpolation, the
    convention shared with stat_levene's histogram median).

    Plan shape: one nation-PARTITIONED rank window over the present
    values (partitioned — safe at any customer count; the median dim is
    |nations| rows) and one broadcast join back onto the column. The
    was_missing flag is first-class: imputation without provenance
    silently poisons downstream models."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 13 == 0, F.lit(None))
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("bigint"))
        .cast("bigint")
        .alias("bal_cents"),
    )
    present = base.filter(F.col("bal_cents").isNotNull())
    w = Window.partitionBy("c_nationkey")
    ranked = present.select(
        "c_nationkey",
        "bal_cents",
        F.row_number()
        .over(w.orderBy("bal_cents", "c_custkey"))
        .cast("bigint")
        .alias("r"),
        F.count("*").over(w).cast("bigint").alias("n"),
    )
    med = (
        ranked.filter(F.col("r") == F.expr("(n + 1) div 2"))
        .groupBy("c_nationkey")
        .agg(F.min("bal_cents").cast("bigint").alias("med_cents"))
    )
    return base.join(F.broadcast(med), "c_nationkey").select(
        "c_custkey",
        F.col("bal_cents").isNull().alias("was_missing"),
        F.coalesce(F.col("bal_cents"), F.col("med_cents"))
        .cast("bigint")
        .alias("bal_cents"),
    )
