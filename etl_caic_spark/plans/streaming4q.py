"""Wave 36b (round 5): session-window MERGE across micro-batches — the
hardest stateful-streaming case: a session that straddles the shard
boundary exists as a PARTIAL session after batch 1 and must be merged
(its interval extended, its count combined) when batch 2's events
arrive. Session aggregations reject update mode, so the run uses
COMPLETE mode — the memory sink is replaced per batch and ends holding
exactly the final merged sessions; the DuckDB oracle recomputes
sessions from scratch with gaps-and-islands. A hash match proves
cross-batch session merging, which no single-batch replay can
exercise.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.streaming import windows as SW

_GAP = "30 minutes"


@register(
    "stream_session_merge_batches",
    oracle="""
    WITH pts AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  OR CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP)) OVER w
                     > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS s
      FROM pts
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sid GROUP BY user_id, s
    """,
    tags=("streaming", "stateful"),
)
def stream_session_merge_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL cross-batch session merging: the event log is split into
    two hive shards at its time midpoint and replayed one shard per
    micro-batch; every session that straddles the cut is built as a
    PARTIAL in one batch and MERGED when the other batch's events
    arrive (state-store session join — interval extended, count
    combined). Session aggregations reject UPDATE mode (Spark raises
    STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION — pinned lesson), and
    append would finalize nothing without a watermark, so the query
    runs COMPLETE mode: the memory sink's contents are replaced each
    batch and after the final batch hold exactly the merged sessions —
    which must equal DuckDB's from-scratch gaps-and-islands
    sessionization. tests/test_wave36.py asserts sessions straddling
    the cut exist, so the merge path demonstrably ran.

    Scale: complete mode re-emits the whole result per batch — fine
    for a bounded replay, wrong for an unbounded stream, where the
    production form is append + watermark (stream_session is that
    sibling); the state-store merge mechanics proven here are
    identical in both."""
    from etl_caic_spark.streaming.windows import cached_event_shards

    ev = load_table(spark, sf_dir, "events")

    def _write_halves(p: str) -> None:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        cut = lo + (hi - lo) / 2
        (
            ev.withColumn("half", (F.col("ts") >= F.lit(cut)).cast("int"))
            .repartition("half")
            .write.partitionBy("half")
            .parquet(p)
        )

    shard_dir = cached_event_shards(
        spark, sf_dir, "etl_caic_smb_shards", _write_halves
    )
    schema = spark.read.parquet(shard_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    )
    agg = stream.groupBy(
        F.session_window("ts", _GAP).alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    # Session-window aggregation rejects update mode (and append would
    # need a watermark that finalizes windows); COMPLETE mode re-emits
    # the full session table each batch and the memory sink REPLACES its
    # contents — so after the last micro-batch the sink holds exactly
    # the final merged sessions, partials from batch 1 already absorbed
    # by the state-store session merge.
    final = SW.run_stream_to_table(spark, agg, "complete")
    return final.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
