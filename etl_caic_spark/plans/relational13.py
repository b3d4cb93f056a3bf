"""Wave 31 (round 5): CSV dialect ingestion (custom delimiter + quoted
fields with embedded delimiters/newlines — the split-unfriendly corner
of real CSV), an AQE skew-join demonstration whose runtime partition
split is ASSERTED on the final plan, and deterministic per-epoch
training-data shuffling.

Exactness: the CSV roundtrip and epoch orders are fully deterministic;
the skew join's result is a plain integer aggregate.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path


@register(
    "scan_csv_dialect",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority || ' | ' || o_orderstatus AS memo,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 20 = 0
    """,
    tags=("scan", "format"),
)
def scan_csv_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-default CSV dialect roundtrip: rows are exported
    pipe-delimited with a memo column that CONTAINS the delimiter
    (' | ') — forcing the writer to quote — then read back with the
    matching (sep='|', quote='\"', escape) options. A reader with the
    wrong dialect splits the memo and shifts every column right — the
    classic silent CSV corruption; the declarative oracle over the
    source table proves the full dialect roundtrip preserved every
    field byte-for-byte.

    Scale: quoted CSV is the SPLIT-HOSTILE format — a record boundary
    can't be found mid-file without quote context, which is why
    multiLine CSV reads are single-task-per-file; keep files small or
    land CSV once and convert to parquet (sink_file_roundtrip) before
    analytics. This query documents the operational posture, not just
    the parse."""
    base = scratch_path("csv_dialect_orders")
    shutil.rmtree(base, ignore_errors=True)
    src = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    out = src.select(
        "o_orderkey",
        F.concat_ws(" | ", "o_orderpriority", "o_orderstatus").alias("memo"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    out.write.option("sep", "|").option("quote", '"').option(
        "header", "true"
    ).csv(base)
    return (
        spark.read.option("sep", "|")
        .option("quote", '"')
        .option("header", "true")
        .schema("o_orderkey bigint, memo string, cents bigint")
        .csv(base)
    )


@register(
    "join_aqe_skew",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                  ELSE l_orderkey % 1000 END AS k,
             CAST(round(l_extendedprice * 100) AS BIGINT) + r.r AS cents
      FROM lineitem,
           LATERAL (SELECT unnest(generate_series(0, 15)) AS r) r
    ),
    dim AS (
      SELECT k, k % 7 AS grp
      FROM (SELECT unnest(generate_series(0, 999)) AS k)
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents * (grp + 1)) AS BIGINT) AS weighted_cents
    FROM fact JOIN dim USING (k)
    """,
    tags=("join", "scale"),
)
def join_aqe_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join handling, demonstrated and ASSERTED: 80% of the
    fact rows collapse onto one hot key (the deliberate skew), the join
    is forced to sort-merge (broadcast disabled for the query's scope),
    and adaptive execution detects the oversized partition at runtime
    and SPLITS it across tasks — the executed plan must carry the
    skew=true marker (tests/test_wave21_26_plans.py). This is the
    no-code-change alternative to manual salting (join_salted_skew is
    the manual twin): AQE re-plans from actual shuffle statistics, so
    the hot key no longer serializes one reducer.

    Getting the split to actually fire surfaced THREE preconditions
    beyond the confs, each found empirically and pinned in comments
    below: (1) the join inputs must be Sort-over-shuffle directly (a
    distinct-built dim interposes a HashAggregate and the rule's
    pattern never matches); (2) the downstream aggregate must not
    require the join's hash partitioning (a count-distinct's keyed
    partial blocks the split); (3) the map side must have MULTIPLE map
    tasks, because a skewed reducer partition is split by mapper
    ranges — one mapper, no split.

    Scale: at 100 TB AQE skew handling is table stakes — a single hot
    key otherwise turns a 1000-executor join into one straggler. The
    thresholds here (factor 2, 64 KB) are shrunk to trigger at test
    scale; production defaults (5x / 256 MB) express the same plan."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # repartition(8): a skewed REDUCER partition is split by MAPPER
        # ranges, so a shuffle fed by one map task (this sf's lineitem is
        # a single parquet file -> one scan task) has nothing to split
        # and AQE silently skips the optimization regardless of skew
        # size or thresholds (found empirically — the most opaque of the
        # three preconditions this query documents). On a real cluster
        # the scan has hundreds of map tasks and this is a non-issue.
        li = load_table(spark, sf_dir, "lineitem").repartition(8)
        # x16 replication: the raw sf0.01 hot partition compresses under
        # the (already shrunk) skew threshold — the demo needs a
        # partition that is actually oversized.
        fact = li.select(
            F.when(F.col("l_orderkey") % 10 < 8, 0)
            .otherwise(F.col("l_orderkey") % 1000)
            .alias("k"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c0"),
        ).select(
            "k",
            "c0",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("r"),
        ).select("k", (F.col("c0") + F.col("r")).alias("cents"))
        # The dim is NATURALLY unique (spark.range) — a distinct-built dim
        # puts a HashAggregate between the Sort and the shuffle stage, and
        # AQE's OptimizeSkewedJoin pattern (Sort directly over the shuffle
        # read) then never matches. Found empirically; the lesson is that
        # skew handling constrains the JOIN INPUT shape, not just confs.
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        joined = fact.join(dim, "k")
        # NOTE: the output aggregate must not require the join's hash
        # partitioning (e.g. a count-distinct's keyed partial) — AQE
        # declines to split a skewed partition when the split would
        # break a downstream distribution requirement, and
        # forceOptimizeSkewedJoin did not override that for this shape
        # (found empirically). A global algebraic aggregate keeps the
        # join output distribution-free and the skew split applies.
        out = joined.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("cents") * (F.col("grp") + 1))
            .cast("bigint")
            .alias("weighted_cents"),
        )
        # Materialize INSIDE the conf scope so AQE finalizes under the
        # shrunk skew thresholds (the join_runtime_bloom lesson: restore
        # confs only after executedPlan is final).
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "skew=true" not in plan:
            raise AssertionError(
                "AQE did not mark the skewed join; plan:\n" + plan[:2000]
            )
        return spark.createDataFrame(rows, out.schema)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "data_epoch_shuffle",
    oracle="""
    WITH epochs AS (SELECT unnest([1, 2]) AS epoch)
    SELECT epoch, doc_id,
           CAST(row_number() OVER (
             PARTITION BY epoch
             ORDER BY md5('ep' || CAST(epoch AS VARCHAR) || ':'
                          || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS position
    FROM documents, epochs
    """,
    tags=("sampling", "llm"),
)
def data_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffling: each training epoch
    orders the corpus by md5('ep<epoch>:'+doc_id) — a different but
    REPRODUCIBLE permutation per epoch, on any engine, with no RNG
    state to checkpoint. This is the data-loader contract for
    multi-epoch training: epoch k's order is a pure function of
    (seed, epoch, doc_id), so a resumed job re-derives its position
    instead of replaying a shuffle log.

    Scale: the permutation itself needs no global sort at training
    time — shard assignment is hash-prefix range partitioning on the
    same md5 key (write shards partitioned by substr(md5,1,2)); the
    global position column materialized here (one rank window per
    epoch) is the small-scale proof of order, not the 100 TB
    mechanism. Pairs with data_mixture_sampler (what to include) and
    multimodal_tar_shards (how shards are laid out)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(1, 3).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs))
    w = Window.partitionBy("epoch").orderBy(
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
        F.col("doc_id"),
    )
    return keyed.select(
        "epoch", "doc_id", F.row_number().over(w).cast("bigint").alias("position")
    )
