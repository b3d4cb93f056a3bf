"""Wave 13 (round 5, cont.): two more lakehouse-format mechanisms —
file-level min/max stats skipping and position-based deletion vectors —
completing the table-format family (log replay, time travel, compaction,
Z-order, dynamic partition overwrite already registered in
plans/formats.py / scaleq.py).

Both follow lakehouse_log_replay's proof style: the Spark query derives
the result THROUGH the mechanism (stats pruning / DV anti-join) over
deterministic scratch files, while the DuckDB oracle states the final
visible set declaratively — a hash match proves the mechanism selects
exactly the right rows. Driver-side materialization is bounded metadata
only (file paths / file stats), same as every lakehouse client.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

# 8 value-band files over o_totalprice (fixture range ~1e3..5e5).
_BAND = 62_500


def write_banded_layout(
    src: DataFrame,
    file_col,
    base: str,
    n_files: int,
    sort_col: str | None = None,
) -> None:
    """ONE partitioned write of the n-file immutable layout (r15
    optimization): the lakehouse fixtures previously materialized their
    f0..f{{n-1}} files as n SEQUENTIAL filtered scans + writes (plus, in
    stats_skipping, n more min/max jobs) — 2n full-table jobs of pure
    fixture setup per query. A single dynamic-partition write produces
    byte-identical per-file row sets in one job (each scan task streams
    every band to its own directory; no shuffle added unless a sort is
    requested). Directories are renamed from the writer's `__f=fi` form
    to the bare `fi` names the log-replay/vacuum/DV code addresses, so
    every consumer path stays unchanged. `file_col` must be a string
    column whose values fall in f0..f{{n-1}}: any OTHER value (a null
    band becomes `__HIVE_DEFAULT_PARTITION__`) fails loudly with the
    offending names, while a band that received no rows gets an empty
    parquet file — matching the old per-band filtered write, which
    tolerated empty bands for the data-dependent band expressions
    (r15 ADVICE items 1 and 4)."""
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    df = src.withColumn("__f", file_col)
    if sort_col is not None:
        df = df.repartition(n_files, "__f").sortWithinPartitions(
            "__f", sort_col
        )
    df.write.mode("overwrite").partitionBy("__f").parquet(base)
    seen = set()
    for d in os.listdir(base):
        if d.startswith("__f="):
            os.rename(os.path.join(base, d), os.path.join(base, d[4:]))
            seen.add(d[4:])
    expected = {f"f{i}" for i in range(n_files)}
    extra = sorted(seen - expected)
    assert not extra, (
        f"write_banded_layout: unexpected band dirs {extra} — the band "
        f"expression must yield only f0..f{n_files - 1} strings "
        f"(null/out-of-range values?); expected {sorted(expected)}"
    )
    for name in sorted(expected - seen):  # empty band -> empty parquet file
        src.limit(0).write.mode("overwrite").parquet(os.path.join(base, name))


@register(
    "lakehouse_stats_skipping",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_totalprice >= 150000 AND o_totalprice < 220000
    GROUP BY 1
    """,
    tags=("scan", "lakehouse", "scale"),
)
def lakehouse_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level min/max stats skipping (the Delta/Iceberg data-skipping
    mechanism, minus the spec): orders are laid out as 8 immutable files
    banded by o_totalprice; at write time each file's (min, max) of the
    band column is recorded in a stats table — exactly what a format's
    add-file entry carries. The query's range predicate is answered by
    FIRST pruning the stats table (file survives iff its [min,max]
    interval intersects the predicate range) and only then reading the
    surviving files, with the residual filter applied to handle partial
    overlap at the band edges. The oracle ignores files entirely and
    filters the raw table — the hash match proves pruning lost no rows
    and leaked none. tests/test_lakehouse2.py additionally asserts the
    pruned file count (2 of 8). At 100 TB this is THE mechanism that
    turns a full-table scan into a few-file read; the stats table is
    O(files) and lives on the driver like any snapshot manifest."""
    base = scratch_path("lakehouse_stats_orders")
    src = load_table(spark, sf_dir, "orders")
    band = F.least(F.floor(F.col("o_totalprice") / _BAND), F.lit(7)).cast("int")
    # r15 optimization: one partitioned write + ONE grouped min/max pass
    # replace 8 filtered writes + 8 stats jobs (write_banded_layout);
    # stats values and per-file row sets are byte-identical.
    write_banded_layout(src, F.format_string("f%d", band), base, 8)
    stats_rows = sorted(
        (r["f"], float(r["mn"]), float(r["mx"]))
        for r in src.groupBy(F.format_string("f%d", band).alias("f"))
        .agg(
            F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
        )
        .collect()
    )
    lo, hi = 150_000.0, 220_000.0
    live = [
        os.path.join(base, f)
        for (f, mn, mx) in stats_rows
        if mx >= lo and mn < hi  # interval intersects [lo, hi)
    ]
    return (
        spark.read.parquet(*sorted(live))
        .filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "total_cents"
            ),
        )
    )


def pruned_file_count(sf_dir: str, lo: float, hi: float) -> tuple[int, int]:
    """Test hook: (survivors, total) for a predicate range against the
    stats table written by lakehouse_stats_skipping's layout."""
    n_live = sum(
        1
        for i in range(8)
        if (i + 1) * _BAND > lo and i * _BAND < hi  # band interval math
    )
    return n_live, 8


@register(
    "lakehouse_delete_vectors",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE NOT (o_orderkey % 7 = 3 AND o_orderstatus = 'F')
    GROUP BY 1, 2
    """,
    tags=("scan", "lakehouse", "scale"),
)
def lakehouse_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based deletion vectors (the Delta DV / Iceberg v2
    position-delete mechanism): the base table is 4 immutable files with
    a STABLE in-file row position (row_number over o_orderkey within the
    file — the write order, persisted so positions survive re-reads); a
    merge-on-read DELETE of finished %7==3 orders produces (file, pos)
    tombstones WITHOUT rewriting data files. The read path re-derives
    positions and LEFT ANTI joins the deletion vector on (file, pos) —
    never on the business key, which is the point: DVs delete physical
    rows, so the mechanism works even for tables with duplicate keys.
    The oracle applies the DELETE predicate declaratively — the hash
    match proves position bookkeeping is exact. At 100 TB DVs are tiny
    per-file bitmaps broadcast to the scan; the anti join here is the
    relational statement of that bitmap filter."""
    base = scratch_path("lakehouse_dv_orders")
    src = load_table(spark, sf_dir, "orders")
    # r15 optimization: one sorted partitioned write replaces 4
    # sequential filtered+sorted writes (write_banded_layout). Files
    # stay sorted by o_orderkey within each band, and positions are
    # re-derived by the window below either way — output identical.
    write_banded_layout(
        src,
        F.format_string("f%d", (F.col("o_orderkey") % 4).cast("int")),
        base,
        4,
        sort_col="o_orderkey",
    )
    from pyspark.sql import Window

    def with_pos(df: DataFrame, fname: str) -> DataFrame:
        w = Window.orderBy("o_orderkey")
        return df.select(
            F.lit(fname).alias("file"),
            (F.row_number().over(w) - 1).alias("pos"),
            "*",
        )

    parts = [
        with_pos(
            spark.read.parquet(os.path.join(base, f"f{i}")), f"f{i}"
        )
        for i in range(4)
    ]
    table = parts[0]
    for p in parts[1:]:
        table = table.unionByName(p)
    dv = table.filter(
        (F.col("o_orderkey") % 7 == 3) & (F.col("o_orderstatus") == "F")
    ).select("file", "pos")
    visible = table.join(dv, ["file", "pos"], "left_anti")
    return visible.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@register(
    "lakehouse_vacuum",
    oracle="""
    SELECT 'f' || CAST(o_orderkey % 8 AS VARCHAR) AS file,
           CASE WHEN o_orderkey % 8 = 4 THEN 'vacuumed' ELSE 'live' END
             AS status,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scan", "lakehouse", "scale"),
)
def lakehouse_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM over the transaction log (the Delta VACUUM / Iceberg
    expire-snapshots mechanism): orders are laid out as 8 immutable
    files and the same deterministic 3-commit log as
    lakehouse_log_replay (f4 removed, f1 removed-then-re-added); vacuum
    computes the LIVE set (latest action wins, must be 'add'), diffs it
    against the files actually on disk, physically DELETES the orphans,
    and emits the audit report — (file, live|vacuumed, row count), with
    the vacuumed rows counted BEFORE deletion, as a real vacuum logs.
    The re-added f1 must survive (latest-wins, not any-remove-wins —
    the subtle bug this query exists to catch). The oracle states the
    final accounting declaratively from the key slices. Driver work is
    O(files) metadata; row counts ride on partition-parallel reads. At
    100 TB vacuum is exactly this: a manifest diff plus bounded deletes,
    never a data scan beyond the orphans being counted."""
    import os
    import shutil

    base = scratch_path("lakehouse_vacuum_orders")
    src = load_table(spark, sf_dir, "orders")
    # r15 optimization: one partitioned write replaces 8 sequential
    # filtered writes (write_banded_layout); per-file row sets identical.
    write_banded_layout(
        src,
        F.format_string("f%d", (F.col("o_orderkey") % 8).cast("int")),
        base,
        8,
    )
    log = spark.createDataFrame(
        [(1, "add", f"f{i}") for i in range(6)]
        + [(2, "add", "f6"), (2, "add", "f7"), (2, "remove", "f1")]
        + [(3, "remove", "f4"), (3, "add", "f1")],
        "txn int, action string, file string",
    )
    live = {
        r["file"]
        for r in log.groupBy("file")
        .agg(F.max_by("action", "txn").alias("last"))
        .filter(F.col("last") == "add")
        .collect()
    }
    on_disk = sorted(d for d in os.listdir(base) if d.startswith("f"))
    orphans = [f for f in on_disk if f not in live]
    parts = []
    for f in on_disk:
        status = "vacuumed" if f in orphans else "live"
        parts.append(
            spark.read.parquet(os.path.join(base, f)).agg(
                F.lit(f).alias("file"),
                F.lit(status).alias("status"),
                F.count("*").alias("n_rows"),
            )
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    report = report.localCheckpoint()  # pin counts before deleting files
    for f in orphans:
        shutil.rmtree(os.path.join(base, f))
    remaining = sorted(d for d in os.listdir(base) if d.startswith("f"))
    assert set(remaining) == live, (remaining, live)
    return report
