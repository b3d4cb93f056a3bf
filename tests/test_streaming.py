"""Batch↔stream equivalence (SURVEY.md §5.2.3): each windowed operator is
run as a batch DataFrame AND as a Structured Streaming file replay
(availableNow trigger, memory sink); results must be identical. Plus a
watermark late-drop scenario test and stateful streaming dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_caic_spark.sources import load_table
from etl_caic_spark.streaming import windows as SW


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("agg", [SW.tumbling_agg, SW.sliding_agg, SW.session_agg])
def test_batch_stream_equivalence(spark, sf_dir, agg):
    batch = agg(load_table(spark, sf_dir, "events"))
    stream = SW.run_stream_to_table(
        spark, agg(SW.read_events_stream(spark, sf_dir)), "complete"
    )
    assert _rows(batch) == _rows(stream)


def test_watermark_append_emits_closed_windows_only(spark, sf_dir):
    """Append-mode output = exactly the windows closed before the final
    watermark; the still-open tail windows stay in state."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    emitted = SW.run_stream_to_table(
        spark,
        SW.watermarked_tumbling(SW.read_events_stream(spark, sf_dir), "10 minutes"),
        "append",
    )
    batch_all = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=10)
    expected = batch_all.filter(F.col("w.end") <= F.lit(horizon)).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )
    assert _rows(emitted) == _rows(expected)
    # and the open tail is genuinely withheld
    assert batch_all.count() > emitted.count()


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark on a replayed stream keeps one row per
    key (stateful dedup — SURVEY.md §2.C streaming)."""
    stream = SW.read_events_stream(spark, sf_dir)
    dedup = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("user_id")
    )
    out = SW.run_stream_to_table(spark, dedup, "append")
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    got = out.collect()
    assert len(got) == n_users
    assert len({r["user_id"] for r in got}) == n_users
