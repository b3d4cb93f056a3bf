"""Wave 33 (round 5): physical-layout and contract operators —
sorted-within-partition writes (the clustering that makes min/max stats
skipping actually work) with the sortedness AUDITED from the files
themselves, and a schema-contract check that turns "does this table
still look like we promised?" into a queryable report.

Exactness: the sortedness audit counts out-of-order adjacent pairs per
physical file (must be zero); the contract report is a deterministic
per-column table.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path


@register(
    "layout_sorted_within_partitions",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS ts_descents
    FROM events GROUP BY 1
    """,
    tags=("layout", "scale", "sink"),
)
def layout_sorted_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-file layout, written AND audited: events are repartitioned
    by event_type and sortWithinPartitions(ts, event_id) before the
    parquet write — the clustering step that gives each physical file a
    tight ts min/max band so stats skipping (lakehouse_stats_skipping)
    and range predicates prune effectively. The AUDIT reads the files
    back, reconstructs each row's physical neighborhood via
    input_file_name() + a per-file window in read order, and counts
    adjacent timestamp DESCENTS per event_type — which must be ZERO, a
    property the declarative oracle states. A plain write (no sort)
    fails this audit; tests/test_wave33.py pins that negative.

    Scale: sortWithinPartitions is a per-partition sort — NO global
    shuffle beyond the repartition; this is the cheap 80% of Z-ordering
    (layout_zorder is the multi-dimension sibling). The audit pattern
    (read back + per-file monotonicity window) is how a lakehouse
    verifies clustering after compaction jobs."""
    base = scratch_path("layout_sorted_events")
    shutil.rmtree(base, ignore_errors=True)
    src = load_table(spark, sf_dir, "events")
    (
        src.repartition("event_type")
        .sortWithinPartitions("ts", "event_id")
        .write.parquet(base)
    )
    back = spark.read.parquet(base).select(
        "event_type", "ts", "event_id", F.input_file_name().alias("f")
    )
    # Physical read order within a parquet file is row order; materialize
    # it as a column first (a nondeterministic expression is not allowed
    # directly in a window ORDER BY), then lag per file.
    back = back.withColumn("rid", F.monotonically_increasing_id())
    w = Window.partitionBy("f").orderBy("rid")
    audited = back.withColumn("prev_ts", F.lag("ts").over(w))
    return audited.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ts_descents"),
    )


_CONTRACT = [
    # (column, expected_type, required)
    ("event_id", "bigint", True),
    ("ts", "timestamp", True),
    ("user_id", "bigint", True),
    ("event_type", "string", True),
    ("value", "double", True),
    ("props", "string", False),
    ("session_id", "string", False),  # contract says optional; absent here
]


@register(
    "dq_schema_contract",
    oracle="""
    SELECT * FROM (VALUES
      ('event_id',   'bigint',    'bigint',    'ok'),
      ('ts',         'timestamp', 'timestamp', 'ok'),
      ('user_id',    'bigint',    'bigint',    'ok'),
      ('event_type', 'string',    'string',    'ok'),
      ('value',      'double',    'double',    'ok'),
      ('props',      'string',    'string',    'ok'),
      ('session_id', 'string',    NULL,        'missing_optional')
    ) AS t(col_name, expected_type, actual_type, status)
    """,
    tags=("dq", "scan"),
)
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract validation as a QUERY: the table's actual schema
    is checked column-by-column against a declared contract (name,
    type, required/optional) and the result is a report table — ok /
    type_mismatch / missing_required / missing_optional — the artifact
    a data-contract CI gate records. The contract includes an optional
    column the fixture does not carry, so the report demonstrably
    distinguishes 'optional absent' from 'broken'. The oracle states
    the expected report for this fixture; a fixture drift (the round-3
    events-ts incident, SKILL.md gotcha) would flip a row to
    type_mismatch and fail the hash — making this query itself a
    fixture-contract tripwire.

    Scale: pure metadata — the schema comes from the parquet footer;
    no data is read at all (the scan never executes)."""
    schema = {f.name: f.dataType.simpleString() for f in
              load_table(spark, sf_dir, "events").schema.fields}
    # Normalize: the loader exposes ts as timestamp (footer-sniffed).
    rows = []
    for col, want, required in _CONTRACT:
        have = schema.get(col)
        if have is None:
            status = "missing_required" if required else "missing_optional"
        elif have == want:
            status = "ok"
        else:
            status = "type_mismatch"
        rows.append((col, want, have, status))
    return spark.createDataFrame(
        rows, "col_name string, expected_type string, actual_type string, status string"
    )
