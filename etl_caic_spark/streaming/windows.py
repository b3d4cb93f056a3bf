"""Structured Streaming operators (SURVEY.md §2.C streaming; milestone M4).

The reference's mode is a scheduled batch pull (task.ts:57 Schedule
invocation) — its streaming analogue is a file-source stream with
Trigger.AvailableNow. Each windowed aggregation here is written as a
transformation that applies identically to a batch DataFrame and a
streaming DataFrame, which is what makes the batch↔stream equivalence
harness (SURVEY.md §5.2.3) possible: the batch form is oracled in DuckDB,
the streaming form must match the batch form.

Scale: windowed/stateful aggs shuffle on (window, key); state store size is
bounded by the watermark horizon, and `session_window` merges state
per key — the standard Structured Streaming story, nothing custom.
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from etl_caic_spark.util import scratch_dir, scratch_path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# State stores instantiate per shuffle partition per stateful operator;
# for bounded replays that fixed cost dominates wall time (measured:
# stream-stream join 9.9s at 32 partitions, ~4s at 8, ~2.7s at 4). On a
# real cluster this is sized to state volume, never this small.
_REPLAY_SHUFFLE_CAP = 4


@contextmanager
def clamped_shuffle(spark: SparkSession, cap: int = _REPLAY_SHUFFLE_CAP):
    """Temporarily cap spark.sql.shuffle.partitions (restored on exit).
    Used around every bounded streaming replay, including queries that
    manage their own writeStream/awaitTermination (e.g. foreachBatch
    merges, whose per-batch jobs otherwise shuffle at the session's
    full partition count — 200 under the driver's plain session)."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(min(int(old_parts), cap)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def cached_event_shards(spark: SparkSession, sf_dir: str, name: str, writer):
    """Materialize a deterministic re-shard of a fixture table once per
    (shard scheme, sf_dir) and reuse it across the PROCESS's runs — the
    re-shard is pure fixed cost (same bytes every run), so repeated
    replays within a verification process shouldn't pay the write
    again. ``writer(path)`` produces the parquet dir; a _SUCCESS marker
    gates reuse. Keyed by the sf_dir basename (so sf0.01 and sf0.1
    never share a cache entry) AND a fingerprint of the source fixture
    (events.parquet size + mtime): if the driver regenerates the
    fixture, the key changes and the stale shards are rebuilt instead
    of silently replayed (round-7 ADVICE item). scratch_path's pid
    suffix (round 9) scopes the cache per process — concurrent
    verification processes used to race this dir's rmtree-rebuild."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size:x}-{st.st_mtime_ns:x}"
    except OSError:
        fp = None  # non-standard fixture layout: never reuse
    path = scratch_path(f"{name}_{tag}_{fp or 'nofp'}")
    if fp is None or not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        writer(path)
    return path

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    """The stream reader needs the schema up front; ``ts``'s raw type depends
    on the fixture's parquet encoding (see sources/tables.py sniffing)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet with ``ts`` normalized to a µs
    TimestampType — the same footer-sniffed branching as the batch loader
    (sources/tables.py), so batch↔stream equivalence holds by construction.
    The footer sanity assert runs here too: silent unit drift throws instead
    of collapsing every timestamp to ~1970."""
    from etl_caic_spark.sources.tables import (
        _assert_sane_ts_range,
        events_ts_physical_type,
        table_path,
    )

    path = table_path(sf_dir, "events")
    kind = events_ts_physical_type(path)
    _assert_sane_ts_range(path, kind)
    if kind == "int_nanos":
        # Parquet TIMESTAMP(NANOS) — annotated or raw INT64 — arrives as a
        # long under the flag (Spark's reader rejects nanos otherwise).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _events_stream_schema(T.LongType())
    elif kind == "timestamp_tz":
        # tz-aware (isAdjustedToUTC) micros/millis surface as TimestampType.
        schema = _events_stream_schema(T.TimestampType())
    else:
        # No-tz parquet timestamps surface as TIMESTAMP_NTZ.
        schema = _events_stream_schema(T.TimestampNTZType())
    # The file source requires a directory; glob-filter to the events file.
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if kind == "int_nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts/sums per event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes, per event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def session_agg(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user: [first_ts, last_ts + gap)."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def watermarked_tumbling(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Tumbling agg with a watermark. In append mode only windows whose end
    precedes the final watermark (max event time - delay) are emitted —
    deterministic for a replayed file source, and oracle-expressible as a
    window-end filter over the batch result."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def run_stream_to_table(
    spark: SparkSession, streaming_df: DataFrame, output_mode: str
) -> DataFrame:
    """Drive a streaming DataFrame to completion via the memory sink
    (availableNow file replay) and return the result as a DataFrame.

    Stateful operators instantiate one state store per shuffle partition;
    at replay scale that fixed cost dominates (a 32-partition stream-stream
    join measured 9.9s vs ~4s at 8 and ~2.7s at 4 — round-6 re-measure),
    so the shuffle-partition count is capped for the duration of the query
    and restored after. On a real cluster this knob is sized to state
    volume, not cores."""
    name = "s" + uuid.uuid4().hex[:12]
    with clamped_shuffle(spark):
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", scratch_dir("ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
