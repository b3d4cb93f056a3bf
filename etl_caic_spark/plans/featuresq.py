"""Feature-engineering / robust-statistics queries for ML data prep:
winsorization, MAD-based outlier detection, k-fold assignment. These are
the per-group robust transforms a training-data pipeline applies between
ingestion and dedup (SURVEY.md §2.C analytics scope; the reference's
197-line Lambda has no statistics surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "feat_winsorize",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           round(CASE WHEN e.value < q.lo THEN q.lo
                      WHEN e.value > q.hi THEN q.hi
                      ELSE e.value END, 6) AS value_wins,
           (e.value < q.lo OR e.value > q.hi) AS was_clipped
    FROM events e JOIN q ON e.event_type = q.event_type
    """,
    tags=("features", "agg", "join"),
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each value to its group's [p05, p95]
    (exact linear-interpolated percentiles — Spark percentile == DuckDB
    quantile_cont). The quantile table is one row per group and is
    broadcast back onto the fact table, so the fact side never shuffles:
    at 100 TB this is one map-side aggregate for the quantiles (or a
    percentile_approx swap-in) plus a broadcast-join pass. Both bounds
    come from ONE percentile(array(...)) sort per group."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(F.lit(0.05), F.lit(0.95))).alias("_q")
    ).select(
        "event_type",
        F.element_at("_q", 1).alias("lo"),
        F.element_at("_q", 2).alias("hi"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    return j.select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.when(F.col("value") < F.col("lo"), F.col("lo"))
            .when(F.col("value") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("value")),
            6,
        ).alias("value_wins"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


@register(
    "anomaly_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT e.event_id, e.event_type, e.value, e.value - m.med AS dev
      FROM events e JOIN m ON e.event_type = m.event_type
    ),
    s AS (
      SELECT event_type, quantile_cont(abs(dev), 0.5) AS mad
      FROM d GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.value, round(d.dev, 6) AS deviation
    FROM d JOIN s ON d.event_type = s.event_type
    WHERE abs(d.dev) > 3.5 * s.mad
    """,
    tags=("features", "anomaly", "agg", "join"),
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag rows
    with |value - median| > 3.5 * MAD per group. Unlike z-scores, median
    and MAD are unmoved by the outliers themselves — the standard robust
    detector for skewed telemetry. Two tiny per-group aggregates (median,
    then MAD of deviations), each broadcast back onto the fact table —
    the fact side is scanned twice but never shuffled; at 100 TB swap the
    exact medians for percentile_approx and the shape is unchanged.
    Deviations are per-row double arithmetic (bit-identical across
    engines); only the output column is rounded."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    d = ev.join(F.broadcast(m), "event_type").withColumn(
        "dev", F.col("value") - F.col("med")
    )
    s = d.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("dev")), F.lit(0.5)).alias("mad")
    )
    return (
        d.join(F.broadcast(s), "event_type")
        .filter(F.abs(F.col("dev")) > 3.5 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("dev", 6).alias("deviation"),
        )
    )


@register(
    "kfold_split",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN h < '3333' THEN 0
                     WHEN h < '6666' THEN 1
                     WHEN h < '9999' THEN 2
                     WHEN h < 'cccc' THEN 3
                     ELSE 4 END AS INT) AS fold
    FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
          FROM documents)
    """,
    tags=("sampling", "features"),
)
def kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment by key hash —
    the k-ary generalization of train_test_split: fold = band of the md5
    hex prefix (each band 0x3333/0x10000 ~ 20%). Partition-layout
    independent and engine-reproducible, unlike randomSplit. Pure
    per-row projection — no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return d.select(
        "doc_id",
        F.when(h < "3333", 0)
        .when(h < "6666", 1)
        .when(h < "9999", 2)
        .when(h < "cccc", 3)
        .otherwise(4)
        .cast("int")
        .alias("fold"),
    )
