"""Wave 25 (round 5): streaming CDC merge — the continuous-upsert shape
(Delta/Iceberg `MERGE` driven by a change stream) that turns an
append-only event log into a latest-state table incrementally. The
event parquet is re-sharded into 4 files and replayed ONE FILE PER
MICRO-BATCH (maxFilesPerTrigger=1, availableNow), so the merge really
executes multiple times against an evolving target — not a single-batch
simulation — and the final table must equal the batch last-write-wins
snapshot (the DuckDB oracle).

Reference parity: the reference's scheduled pull (task.ts:57,193-197)
is exactly this pattern — periodic batches merged into current state;
here it is expressed with Structured Streaming's checkpointed replay.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.util import scratch_path


@register(
    "stream_cdc_merge",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id, event_id, event_type, value, ts_s
    FROM ranked WHERE rk = 1
    """,
    tags=("streaming", "cdc", "lakehouse"),
)
def stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL incremental streaming merge: the event log is re-sharded to
    4 parquet files and streamed with maxFilesPerTrigger=1 under
    availableNow, so foreachBatch fires ~4 times; each micro-batch
    (a) reduces ITSELF to last-write-per-user — map-side shrink before
    touching the target, (b) unions with the current target version and
    keeps the per-user row with max (ts, event_id), and (c) writes a
    NEW immutable target version directory (v<epoch>) — merge-as-
    copy-on-write, so a crashed batch can never half-overwrite state
    and replays are idempotent (same epoch → same version path). The
    final version must equal the batch last-write-wins snapshot — the
    oracle.

    Scale: per batch the merge cost is |batch keys ∪ target| on ONE
    shuffle key (user_id); production engines narrow the rewrite to
    touched files via min/max key stats (the lakehouse_stats_skipping
    pattern composes here). State lives in the table, not executor
    memory — unbounded keys are fine. Watermarking is unnecessary
    because late rows lose the (ts, event_id) max_by on merge."""
    ckpt_dir = scratch_path("etl_caic_cdcm_ckpt")
    tgt_root = scratch_path("etl_caic_cdcm_target")
    for p in (ckpt_dir, tgt_root):
        shutil.rmtree(p, ignore_errors=True)

    # Re-shard the log so the file source yields multiple micro-batches
    # (cached across runs — same bytes every time).
    from etl_caic_spark.sources import load_table
    from etl_caic_spark.streaming.windows import cached_event_shards

    shard_dir = cached_event_shards(
        spark,
        sf_dir,
        "etl_caic_cdcm_shards",
        lambda p: load_table(spark, sf_dir, "events")
        .repartition(4)
        .write.parquet(p),
    )

    ev = (
        spark.readStream.schema(spark.read.parquet(shard_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("ts"),
        )
    )

    def _latest_versions() -> list[str]:
        return sorted(glob.glob(os.path.join(tgt_root, "v*")))

    def _merge(batch_df, epoch_id):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        delta = (
            batch_df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .drop("rk")
        )
        versions = _latest_versions()
        if versions:
            current = batch_df.sparkSession.read.parquet(versions[-1])
            merged = (
                current.unionByName(delta)
                .withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .drop("rk")
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(tgt_root, f"v{int(epoch_id):06d}")
        )

    from etl_caic_spark.streaming.windows import clamped_shuffle

    # The per-batch merge jobs inherit the SESSION's shuffle partition
    # count (200 under a plain session) for their tiny window shuffles —
    # clamp for the replay like run_stream_to_table does.
    with clamped_shuffle(spark):
        q = (
            ev.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = _latest_versions()[-1]
    return spark.read.parquet(final).select(
        "user_id", "event_id", "event_type", "value", "ts_s"
    )
