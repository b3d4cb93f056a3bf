"""Privacy / governance operators: k-anonymity audit over
quasi-identifiers and deterministic keyed pseudonymization with
referential consistency — the release-gating steps of a data-sharing
pipeline (and of training-corpus PII hygiene alongside text_redact_pii,
plans/llm4.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "priv_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(count(*) OVER (
               PARTITION BY c_nationkey, c_mktsegment,
                            CAST(floor(c_acctbal / 1000) AS BIGINT)
             ) AS BIGINT) AS k
      FROM customer
    )
    SELECT c_custkey, c_nationkey, c_mktsegment, bal_band, k,
           CASE WHEN k < 5 THEN true ELSE false END AS suppressed
    FROM g
    """,
    tags=("privacy", "dq"),
)
def priv_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: each customer annotated with its equivalence-
    class size over the quasi-identifier tuple (nation, market segment,
    $1000 balance band) and a suppression flag for classes with k < 5 —
    the records a k=5 release would have to drop or generalize further.

    Plan: a single window count over the QID partition (one shuffle on
    the QID hash). Equivalence classes are the unit of privacy risk, so
    the shuffle key IS the analysis key — no cheaper shape exists; at
    100 TB the class-count distribution is exactly what the shuffle
    hash-partitions by, and a skewed QID (one huge class) is the
    SAFE case (high k), so skew never concentrates risky rows.
    """
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    w = Window.partitionBy("c_nationkey", "c_mktsegment", band)
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        band.alias("bal_band"),
        F.count("*").over(w).cast("bigint").alias("k"),
    ).withColumn("suppressed", F.col("k") < 5)


@register(
    "priv_pseudonymize",
    oracle="""
    WITH ps AS (
      SELECT o_orderkey,
             substr(sha256('graft-salt-v1' || CAST(o_custkey AS VARCHAR)),
                    1, 16) AS cust_pseudo,
             o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT cust_pseudo,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS total_spend
    FROM ps GROUP BY 1
    """,
    tags=("privacy",),
)
def priv_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization with utility preserved: o_custkey is
    replaced by a 16-hex-char salted SHA-256 surrogate (deterministic,
    so the same customer maps to the same pseudonym across tables and
    runs — referential integrity survives), then per-pseudonym order
    stats prove aggregations still work on the anonymized view. Spend
    is summed in integer cents so the cross-engine hash is exact.

    Plan: pure narrow projection (hash is a JVM-side codegen expr) plus
    one groupBy on the pseudonym — same cost as grouping on the raw
    key. The salt lives with the query, not the data; rotating it
    re-keys every pseudonym without touching the pipeline shape.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    ps = o.select(
        F.substring(
            F.sha2(
                F.concat(F.lit("graft-salt-v1"), F.col("o_custkey").cast("string")),
                256,
            ),
            1,
            16,
        ).alias("cust_pseudo"),
        "o_orderstatus",
        # Integer cents via round-then-cast: DuckDB's double->BIGINT cast
        # ROUNDS while Spark's TRUNCATES, so the explicit round() first is
        # what keeps both engines on the same integer.
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return ps.groupBy("cust_pseudo").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.count_distinct("o_orderstatus").cast("bigint").alias("n_statuses"),
        F.round(F.sum("cents").cast("double") / 100, 2).alias("total_spend"),
    )


@register(
    "priv_dp_noisy_counts",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS true_count
      FROM customer GROUP BY 1, 2
    ), u AS (
      SELECT *,
             (CAST(('0x' || substr(md5('dp-seed-v1|' || CAST(c_nationkey AS VARCHAR)
                    || '|' || c_mktsegment), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS unif
      FROM g
    )
    SELECT c_nationkey, c_mktsegment, true_count,
           CAST(true_count + round(
             -1.0 * CASE WHEN unif >= 0.5 THEN 1.0 ELSE -1.0 END
             * ln(1.0 - 2.0 * abs(unif - 0.5))) AS BIGINT) AS noisy_count
    FROM u
    """,
    tags=("privacy",),
)
def priv_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-SHAPED reproducible pseudo-noise over (nation, segment)
    counts — the noise pipeline of the Laplace mechanism at b=1
    (noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|), the standard
    inverse-CDF draw), with the uniform hash-seeded from the group key.

    THIS IS NOT DIFFERENTIAL PRIVACY. The seed string lives in this
    repo and the hash input is the released group key, so any reader
    can recompute the exact noise and subtract it — the release carries
    zero DP protection. The determinism is deliberate here: it is what
    lets the DuckDB twin match bit-for-bit, making the noise PIPELINE
    (inverse-CDF transform, integer rounding, post-noise casts)
    hash-verifiable. A production DP deployment would (a) draw the seed
    from a secret salt held OUT of the release (per-release, never
    reused), and (b) account epsilon across releases; the oracle twin
    would then need the same secret to verify. Plan: one groupBy, then
    pure scalar codegen — the noise adds zero distributed cost at any
    scale.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    unif = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp-seed-v1|"),
                        F.col("c_nationkey").cast("string"),
                        F.lit("|"),
                        F.col("c_mktsegment"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = F.round(
        F.lit(-1.0)
        * F.when(F.col("unif") >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("unif") - F.lit(0.5)))
    )
    return (
        g.withColumn("unif", unif)
        .select(
            "c_nationkey",
            "c_mktsegment",
            "true_count",
            (F.col("true_count") + noise).cast("bigint").alias("noisy_count"),
        )
    )
