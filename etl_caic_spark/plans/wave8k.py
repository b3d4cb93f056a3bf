"""Round-8 wave K: Fleiss' kappa.

``eval_fleiss_kappa`` generalizes eval_cohen_kappa (wave8f.py) from two
annotators to m raters per item. With m = 3 raters reconstructed from
the event stream, every quantity is exact-integer until one final
division:

    P_bar  = (sum_i sum_j n_ij^2 - N*m) / (N*m*(m-1))
    Pe_bar = sum_j (c_j / (N*m))^2
    kappa  = (P_bar - Pe_bar) / (1 - Pe_bar)

Multiplying numerator and denominator by N*m*(m-1) * (N*m)^2 clears all
fractions: with A = sum n_ij^2 - N*m, C2 = sum_j c_j^2, the identity

    kappa = (A * (N*m)^2 - N*m*(m-1) * C2)
          / (N*m*(m-1) * ((N*m)^2 - C2))

holds in exact integers (DECIMAL-ladder accumulators; (N*m)^2 ~ 1e11 at
sf0.1, safe in int64 to N*m ~ 3e9, DECIMAL beyond), with one rounded
division to micro-units.

Reference parity: none — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_M = 3  # raters per item

_FLEISS_SQL = f"""
    WITH lab AS (
      SELECT event_id // {_M} AS item, event_type AS label
      FROM events
    ),
    full_items AS (
      SELECT item FROM lab GROUP BY 1 HAVING count(*) = {_M}
    ),
    cell AS (
      SELECT l.item, l.label, CAST(count(*) AS BIGINT) AS n_ij
      FROM lab l JOIN full_items USING (item)
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(count(DISTINCT item) AS BIGINT) AS n_items,
             CAST(sum(n_ij * n_ij) AS BIGINT) AS sq
      FROM cell
    ),
    marg AS (
      SELECT CAST(sum(cj * cj) AS HUGEINT) AS c2
      FROM (SELECT CAST(sum(n_ij) AS BIGINT) AS cj FROM cell GROUP BY label)
    ),
    t AS (
      SELECT n_items, sq, c2,
             CAST(n_items * {_M} AS HUGEINT) AS nm
      FROM agg CROSS JOIN marg
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(sq - n_items * {_M} AS BIGINT) AS agree_sum,
           CAST(c2 AS BIGINT) AS chance_sq_sum,
           CAST(round(((sq - n_items * {_M}) * nm * nm
                       - nm * {_M - 1} * c2) * 1000000.0
                      / (nm * {_M - 1} * (nm * nm - c2))) AS BIGINT)
             AS kappa_micro
    FROM t
"""


@register("eval_fleiss_kappa", oracle=_FLEISS_SQL, tags=("eval", "stats"))
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for m={_M} raters per item (item = event_id div
    {_M}, label = event_type; only fully-rated items count). The
    fraction-cleared identity in the module docstring makes every term
    an exact integer; accumulators ride DECIMAL(38,0)/HUGEINT and one
    rounded division publishes micro-units.

    Plan shape: one scan -> full-items HAVING filter (partial agg) ->
    (item, label) cell counts -> two dimension-sized reduces. The item
    join is the only keyed shuffle; labels are a tiny domain. At 100 TB:
    identical — the algebra needs only three scalars."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        F.expr(f"event_id div {_M}").alias("item"),
        F.col("event_type").alias("label"),
    )
    full_items = lab.groupBy("item").count().filter(F.col("count") == _M).select("item")
    cell = (
        lab.join(full_items, "item")
        .groupBy("item", "label")
        .agg(F.count("*").cast("bigint").alias("n_ij"))
    )
    agg = cell.agg(
        F.countDistinct("item").cast("bigint").alias("n_items"),
        F.sum(F.col("n_ij") * F.col("n_ij")).cast("bigint").alias("sq"),
    )
    marg = (
        cell.groupBy("label")
        .agg(F.sum("n_ij").cast("bigint").alias("cj"))
        .agg(
            F.sum(F.col("cj").cast("decimal(38,0)") * F.col("cj")).alias("c2")
        )
    )
    t = agg.crossJoin(marg).select(
        "n_items",
        "sq",
        "c2",
        (F.col("n_items").cast("decimal(38,0)") * _M).alias("nm"),
    )
    num = (
        (F.col("sq") - F.col("n_items") * _M) * F.col("nm") * F.col("nm")
        - F.col("nm") * (_M - 1) * F.col("c2")
    )
    den = F.col("nm") * (_M - 1) * (F.col("nm") * F.col("nm") - F.col("c2"))
    return t.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        (F.col("sq") - F.col("n_items") * _M).cast("bigint").alias("agree_sum"),
        F.col("c2").cast("bigint").alias("chance_sq_sum"),
        F.round(num * 1000000.0 / den).cast("bigint").alias("kappa_micro"),
    )
