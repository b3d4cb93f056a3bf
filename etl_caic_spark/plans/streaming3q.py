"""Wave 34 (round 5): multi-micro-batch streaming aggregation with the
incremental accumulation PROVEN, not assumed. Every prior streaming
window query replays the log in one availableNow batch; here the log is
split into 4 round-robin shards consumed ONE PER MICRO-BATCH, so each
1-hour window's count accumulates across several batches of state
updates — and the query OUTPUTS how many batches touched each window
(n_updates), which the oracle replays as count(DISTINCT event_id % 4).
A hash match therefore proves (a) the final counts equal the batch
group-by AND (b) the stream really delivered each window's rows over
exactly the predicted set of micro-batches — cross-batch state merge
demonstrated end-to-end.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.streaming import windows as SW


@register(
    "stream_multi_batch_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_id % 4) AS BIGINT) AS n_updates
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "stateful"),
)
def stream_multi_batch_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts accumulated ACROSS micro-batches: the
    event log is re-written hive-partitioned by shard = event_id % 4
    (4 files), streamed with maxFilesPerTrigger=1 under availableNow
    (4 real micro-batches), aggregated in UPDATE mode into the memory
    sink, and finalized by taking each window's last update (max n —
    counts are monotone). Because sharding is round-robin, most
    windows receive rows in several batches, so the final count is
    only right if the state store carried partial counts between
    batches — and n_updates (distinct batches that updated the window,
    emitted by update mode exactly once per touching batch) is
    replayed by the oracle as count(DISTINCT event_id % 4), pinning
    the batch-delivery pattern itself.

    Scale: state is one (count) per open window/type — watermark-free
    here because the replay is bounded; production adds
    withWatermark to bound state (stream_watermark is that sibling).
    The shard column rides the directory, not the rows."""
    from etl_caic_spark.streaming.windows import cached_event_shards

    ev = load_table(spark, sf_dir, "events")
    shard_dir = cached_event_shards(
        spark,
        sf_dir,
        "etl_caic_mbw_shards",
        lambda p: ev.withColumn("shard", (F.col("event_id") % 4).cast("int"))
        .repartition("shard")
        .write.partitionBy("shard")
        .parquet(p),
    )
    schema = spark.read.parquet(shard_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    )
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    updates = SW.run_stream_to_table(spark, agg, "update")
    per_key = updates.groupBy(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_updates"),
    )
    return per_key
