"""Wave 35 (round 5): AQE runtime join re-planning — the static plan
chooses sort-merge (static broadcast threshold disabled, mimicking the
no-stats reality of fresh tables), and adaptive execution converts to a
BROADCAST join at runtime once the dim side's true shuffle size is
known. Completes the AQE mechanism family: runtime bloom pruning
(join_runtime_bloom), skew splitting (join_aqe_skew), and now
stats-driven join-strategy conversion — the three re-plans that save
real clusters daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "join_aqe_broadcast_convert",
    oracle="""
    SELECT n_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS balance_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
    tags=("join", "scale"),
)
def join_aqe_broadcast_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime sort-merge→broadcast conversion: with the STATIC
    broadcast threshold disabled (the planner state of a table with no
    stats — fresh ingests, post-ETL temp views), the initial plan is a
    shuffle sort-merge join; after the dim side's shuffle materializes,
    AQE sees its true size (25 nations) and re-plans the join as a
    BroadcastHashJoin, skipping the fact-side sort entirely. BOTH
    facts are asserted: the Spark-side logic raises unless the final
    executed plan contains BroadcastHashJoin while the initial plan
    chose SortMergeJoin — so the query green-lights only if the
    runtime conversion actually happened.

    Scale: this is the AQE behavior that makes 'collect stats or
    else' obsolete for dim tables — a 100 TB fact never pays the sort
    when the dim turns out broadcast-small at runtime. Gotcha pinned
    in comments: the ADAPTIVE threshold falls back to the static one
    when unset, so disabling the static threshold alone silently
    disables the runtime conversion too — the two knobs must be set
    independently."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_adaptive = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # The adaptive threshold FALLS BACK to the static one when unset —
    # disabling the static threshold alone also disables the runtime
    # conversion (found empirically); the two knobs must be split.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    old_ratio = spark.conf.get(
        "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin", None
    )
    # Second gotcha: a TINY dim under MANY shuffle partitions (25 rows
    # over the default 200) has a non-empty-partition ratio under the
    # 0.2 default, and AQE then refuses it as a broadcast build side
    # entirely — the conversion silently never fires on exactly the
    # dimension tables it is meant for. Surfaced by the driver's plain
    # 200-partition session (the 8-partition test session masked it).
    spark.conf.set(
        "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin", "0.0"
    )
    try:
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        out = (
            c.join(n, c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_nationkey").alias("nation"))
            .agg(
                F.count("*").cast("bigint").alias("n_customers"),
                F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                .cast("bigint")
                .alias("balance_cents"),
            )
        )
        rows = out.collect()
        qe = out._jdf.queryExecution()
        final = qe.executedPlan().toString()
        full = qe.toString()
        if "BroadcastHashJoin" not in final.split("== Initial Plan ==")[0]:
            raise AssertionError(
                "AQE did not convert to broadcast; final plan:\n" + final[:2000]
            )
        if "SortMergeJoin" not in full:
            raise AssertionError(
                "initial plan was not sort-merge (static threshold leak?):\n"
                + full[:2000]
            )
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_adaptive is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_adaptive
            )
        if old_ratio is None:
            spark.conf.unset(
                "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin"
            )
        else:
            spark.conf.set(
                "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin",
                old_ratio,
            )
