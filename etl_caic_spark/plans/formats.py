"""Source/sink format coverage (milestone M11): CSV / JSON-lines / ORC
writers + schema-explicit readers (lossless roundtrips, oracled against
the source query), and a hive-partitioned parquet dataset whose reads
prune partitions (the single most important scan optimization at 100 TB;
pruning is plan-asserted in tests/test_formats.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

_ROUNDTRIP_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_orderkey % 19 = 0
"""

_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


def _roundtrip_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 19 == 0)
    return li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@register("sink_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE, tags=("sink", "format"))
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write → schema-explicit CSV read (never inferSchema in an
    engine path — inference is a full extra pass and type-unstable)."""
    path = scratch_path("roundtrip_csv")
    _roundtrip_src(spark, sf_dir).write.mode("overwrite").option("header", True).csv(
        path
    )
    return spark.read.schema(_ROUNDTRIP_SCHEMA).option("header", True).csv(path)


@register("sink_jsonl_roundtrip", oracle=_ROUNDTRIP_ORACLE, tags=("sink", "format"))
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → schema-explicit JSON read (the reference's
    payload format, file-shaped)."""
    path = scratch_path("roundtrip_jsonl")
    _roundtrip_src(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).json(path)


@register("sink_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE, tags=("sink", "format"))
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read (second columnar format; same pushdown story as
    parquet)."""
    path = scratch_path("roundtrip_orc")
    _roundtrip_src(spark, sf_dir).write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@register(
    "scan_partition_pruned",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY o_orderstatus
    """,
    tags=("scan", "partition"),
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned dataset scan with static partition pruning: orders
    re-laid-out as .../o_year=YYYY/...; the year filter prunes whole
    directories before any IO (PartitionFilters in the scan node —
    asserted in tests). At 100 TB this is the difference between reading
    2 years and reading 30."""
    path = scratch_path("orders_by_year")
    src = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    src.write.mode("overwrite").partitionBy("o_year").parquet(path)
    part = spark.read.parquet(path)
    return (
        part.filter(F.col("o_year").isin(1996, 1997))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "scan_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, c_name, round(c_acctbal, 2)
    FROM customer WHERE c_custkey % 2 = 1
    """,
    tags=("source", "format", "schema"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: an old writer produced files WITHOUT the
    c_acctbal column, a newer writer added it; mergeSchema=true unifies
    the footers and back-fills the missing column with NULLs — the
    add-a-column migration every long-lived lake table goes through.
    The merge happens at footer level (one extra driver-side pass over
    file metadata); row data is never rewritten. At 100 TB prefer
    pinning the unified schema via .schema(...) once known — mergeSchema
    footer-listing cost grows with file count, which is why this query
    demonstrates but does not default it."""
    import shutil

    c = load_table(spark, sf_dir, "customer")
    out = scratch_path("etl_caic_schema_evo")
    shutil.rmtree(out, ignore_errors=True)
    old = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    new = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    old.write.parquet(f"{out}/v=1")
    new.write.parquet(f"{out}/v=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/v=1", f"{out}/v=2"
    )
    return merged.select("c_custkey", "c_name", "c_acctbal")


@register("sink_xml_roundtrip", oracle=_ROUNDTRIP_ORACLE, tags=("sink", "format"))
def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML write → schema-explicit XML read (Spark 4 ships the XML source
    natively; rowTag framing). Same lossless-roundtrip contract as the
    CSV/JSONL/ORC sinks — the oracle is the SOURCE slice, so the write+
    read must be value-preserving. XML is the interchange format of the
    legacy-feed world; at 100 TB it is an ingest-only format (row-based,
    no column pruning) — land it to parquet in one pass, as here."""
    import shutil

    out = scratch_path("etl_caic_sink_xml")
    shutil.rmtree(out, ignore_errors=True)
    _roundtrip_src(spark, sf_dir).write.format("xml").option(
        "rowTag", "row"
    ).save(out)
    return (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema(_ROUNDTRIP_SCHEMA)
        .load(out)
    )


@register(
    "sink_text_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_orderkey % 19 = 0
    """,
    tags=("sink", "format"),
)
def sink_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink/source: rows serialized to one delimited
    line each (spark.read.text is the raw-log ingest path — one `value`
    column, no schema), then parsed back with split/cast projections.
    The quantity travels as integer CENTS in the line so the re-cast
    double is exact. Text scans can't prune columns — every byte of
    every line is read — which is why raw logs get parsed once and
    landed columnar; this query IS that parse step."""
    import shutil

    out = scratch_path("etl_caic_sink_text")
    shutil.rmtree(out, ignore_errors=True)
    src = _roundtrip_src(spark, sf_dir)
    src.select(
        F.concat_ws(
            "\x1f",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_returnflag"),
            F.round(F.col("l_quantity") * 100, 0).cast("bigint").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(out)
    t = spark.read.text(out)
    p = F.split(F.col("value"), "\x1f")
    return t.select(
        F.element_at(p, 1).cast("bigint").alias("l_orderkey"),
        F.element_at(p, 2).cast("int").alias("l_linenumber"),
        F.element_at(p, 3).alias("l_returnflag"),
        (F.element_at(p, 4).cast("bigint") / 100.0).alias("l_quantity"),
    )


@register(
    "source_python_datasource",
    oracle="""
    SELECT s AS id, CAST(s % 8 AS INT) AS part,
           (s * 2654435761) % 1000003 AS val,
           'p' || CAST(s % 7 AS VARCHAR) AS label
    FROM generate_series(0, 4999) t(s)
    """,
    tags=("source", "datasource"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through a CUSTOM Python DataSource (Spark 4 datasource API,
    sources/pyds.py): 8 InputPartitions stride the id space, so the read
    is executor-parallel with no driver bottleneck — the connector shape
    for APIs Spark lacks, complementing the driver-side REST snapshot
    source (sources/rest.py). Rows are a pure function of id, so the
    oracle reproduces the scan content exactly — a hash-matched custom
    source."""
    from etl_caic_spark.sources.pyds import register_synthseq

    register_synthseq(spark)
    return (
        spark.read.format("synthseq")
        .option("n", 5000)
        .option("parts", 8)
        .load()
    )


@register(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(CASE WHEN c_custkey % 4 = 0 THEN NULL
                     ELSE c_custkey END AS BIGINT) AS c_custkey,
           c_mktsegment,
           (c_custkey % 4 = 0) AS is_corrupt
    FROM customer WHERE c_custkey % 3 = 0
    """,
    tags=("source", "format", "dq"),
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion of a feed with malformed rows: every 4th
    row carries an unparseable key ('X'-prefixed), and the reader lands
    it as NULL + populates columnNameOfCorruptRecord instead of failing
    the job — the quarantine-don't-crash ingest contract (the corrupt
    line is preserved verbatim for a dead-letter sink). The oracle
    derives the same good/bad classification from the corruption rule.
    FAILFAST is the right mode only when upstream is trusted;
    DROPMALFORMED silently loses data and is never the default here."""
    import shutil

    from pyspark.sql import types as T

    out = scratch_path("etl_caic_csv_malformed")
    shutil.rmtree(out, ignore_errors=True)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    c.select(
        F.concat(
            F.when(F.col("c_custkey") % 4 == 0, F.lit("X")).otherwise(F.lit("")),
            F.col("c_custkey").cast("string"),
            F.lit(","),
            F.col("c_mktsegment"),
        ).alias("value")
    ).write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    read = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    return read.select(
        "c_custkey",
        # corrupt rows park the raw line in _corrupt and null out fields;
        # recover the segment for the audit output from the raw line
        F.coalesce(
            "c_mktsegment", F.split(F.col("_corrupt"), ",").getItem(1)
        ).alias("c_mktsegment"),
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
    )


@register(
    "sink_partition_overwrite",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round((CASE WHEN o_orderpriority = '1-URGENT'
                                     THEN o_totalprice + 1000
                                     ELSE o_totalprice END) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS total
    FROM orders
    GROUP BY 1
    """,
    tags=("sink", "format", "scale"),
)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill sink: write
    the full orders table hive-partitioned by priority, then rewrite ONLY
    the 1-URGENT partition (prices restated +1000) with
    partitionOverwriteMode=dynamic, and read the dataset back. The final
    state proves the selective overwrite: untouched partitions keep their
    original rows, the restated partition holds only the new ones.

    Why it matters at 100 TB: backfilling one day/partition of a petabyte
    table must not truncate the rest (STATIC mode would); dynamic mode
    commits exactly the partitions present in the incoming frame, so a
    re-run of the same backfill is idempotent. Totals are summed in
    integer cents to stay order-independent."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    path = scratch_path("partition_overwrite")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    spark.conf.set(key, "dynamic")
    try:
        restated = src.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000
        )
        restated.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("total"),
        )
    )


@register(
    "scan_dynamic_partition_pruning",
    oracle="""
    WITH pick AS (
      SELECT DISTINCT year(o_orderdate) AS y
      FROM orders WHERE o_orderkey % 9973 = 0
    )
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total
    FROM orders JOIN pick ON year(o_orderdate) = pick.y
    GROUP BY 1
    """,
    tags=("scan", "partition", "join", "scale"),
)
def scan_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP) — the third pruning mechanism
    after static PartitionFilters (scan_partition_pruned) and runtime
    bloom filters (join_runtime_bloom): the partition keys to keep are
    only known AFTER filtering the dimension side, so Spark plans a
    dynamicpruning#N subquery that runs the dim filter first and prunes
    the fact's partition directories before their IO. Asserted on the
    plan in tests/test_formats.py.

    At 100 TB this is the mechanism behind 'join a date-partitioned
    fact to a filtered calendar dim and only touch the matching days' —
    static pruning can't do it (the literal year set isn't in the
    query) and bloom pruning works per-row, not per-directory."""
    path = scratch_path("orders_dpp")
    src = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    src.write.mode("overwrite").partitionBy("o_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9973 == 0)
        .select(F.year("o_orderdate").alias("y"))
        .distinct()
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        fact.join(dim, fact["o_year"] == dim["y"])
        .groupBy(fact["o_year"].cast("int").alias("o_year"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("total"),
        )
    )


@register(
    "lakehouse_log_replay",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total
    FROM orders
    WHERE o_orderkey % 8 <> 4
    GROUP BY 1
    """,
    tags=("scan", "lakehouse", "scale"),
)
def lakehouse_log_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-format transaction-log replay (the Delta/Iceberg snapshot
    mechanism, minus the spec): orders are laid out as 8 immutable data
    files; a deterministic action log (txn, add/remove, file) carries
    three commits — initial adds, an append+delete, then a delete plus a
    re-add. The CURRENT snapshot = per file, the LATEST action wins
    (max_by over txn) and it must be an 'add'. The replay computes that
    live set from the log relationally, then reads ONLY the live files.

    Files f0..f7 hold o_orderkey % 8 slices; the log leaves f4 dead, so
    the snapshot equals orders minus the %8==4 slice — the oracle states
    that final set declaratively while the query derives it from the
    log. Driver-side materialization is the live-PATH list only (file
    count, not row count — the same bounded log replay every lakehouse
    client performs)."""
    import os

    base = scratch_path("lakehouse_orders")
    src = load_table(spark, sf_dir, "orders")
    # r15 optimization: one partitioned write replaces 8 sequential
    # filtered writes (lakehouse2q.write_banded_layout); per-file row
    # sets identical.
    from etl_caic_spark.plans.lakehouse2q import write_banded_layout

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
    live = (
        log.groupBy("file")
        .agg(F.max_by("action", "txn").alias("last_action"))
        .filter(F.col("last_action") == "add")
    )
    paths = [
        os.path.join(base, r["file"]) for r in live.select("file").collect()
    ]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        spark.read.parquet(*sorted(paths))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("total"),
        )
    )


@register(
    "lakehouse_time_travel",
    oracle="""
    SELECT 2 AS as_of_txn, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 8 <> 1
    GROUP BY 1, 2
    UNION ALL
    SELECT 3, o_orderstatus, CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderkey % 8 <> 4
    GROUP BY 1, 2
    """,
    tags=("scan", "lakehouse"),
)
def lakehouse_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the lakehouse_log_replay transaction log: the
    snapshot AS OF txn N replays only actions with txn <= N. As of txn 2
    the f1 delete is live (f1 absent, f4 present); as of txn 3 the
    re-add of f1 and the f4 delete both apply. Both snapshots come from
    the SAME immutable data files — time travel is purely a log-replay
    cutoff, which is exactly how Delta/Iceberg implement VERSION AS OF.

    Scale: per-version cost is the log replay (rows = #actions) plus IO
    for that version's live files only."""
    import os

    base = scratch_path("lakehouse_orders_tt")
    src = load_table(spark, sf_dir, "orders")
    # r15 optimization: one partitioned write replaces 8 sequential
    # filtered writes (lakehouse2q.write_banded_layout); per-file row
    # sets identical.
    from etl_caic_spark.plans.lakehouse2q import write_banded_layout

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

    def snapshot(as_of: int):
        live = (
            log.filter(F.col("txn") <= as_of)
            .groupBy("file")
            .agg(F.max_by("action", "txn").alias("last_action"))
            .filter(F.col("last_action") == "add")
        )
        paths = [
            os.path.join(base, r["file"]) for r in live.select("file").collect()
        ]
        return (
            spark.read.parquet(*sorted(paths))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .select(
                F.lit(as_of).alias("as_of_txn"),
                "o_orderstatus",
                "n",
            )
        )

    return snapshot(2).unionByName(snapshot(3))


@register(
    "sink_python_datasource",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("sink", "datasource"),
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write through a CUSTOM Python DataSource WRITER (Spark 4
    `DataSourceWriter`, sources/pyds.py JsonlSinkDataSource) and read
    the files back with an explicit schema — the sink-side twin of
    source_python_datasource, completing the custom-connector surface
    (batch read / stream read / batch write). Each task writes a temp
    file and the driver-side commit() promotes them — the two-phase
    protocol that makes a custom sink exactly-once per job even under
    task retries/speculation. Doubles survive the JSON text roundtrip
    exactly (shortest-repr serialization both ways), so the standard
    roundtrip oracle hash-matches."""
    import shutil

    from etl_caic_spark.sources.pyds import register_jsonlsink

    register_jsonlsink(spark)
    out = scratch_path("jsonlsink_out")
    shutil.rmtree(out, ignore_errors=True)
    src = _roundtrip_src(spark, sf_dir)
    src.write.format("jsonlsink").option("path", out).mode("overwrite").save()
    return spark.read.schema(_ROUNDTRIP_SCHEMA).json(out)
