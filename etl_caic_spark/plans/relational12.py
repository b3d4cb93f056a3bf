"""Wave 28 (round 5): three remaining plan families — exact-substring
decontamination via a broadcast nested-loop join (the one join shape no
other registered query exercises: a NON-EQUI predicate with no key at
all), recursive globbed ingestion (pathGlobFilter + recursiveFileLookup
over a messy directory tree), and sweep-line concurrency counting
(max simultaneous sessions — the interval-stabbing aggregate).

Exactness: substring probes are deterministic slices of the corpus
itself; concurrency is integer +1/−1 prefix sums; the glob scan's
oracle states the expected row set declaratively.
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
    "text_substring_contamination",
    oracle="""
    WITH probes AS (
      SELECT doc_id AS probe_id, substr(text, 11, 30) AS probe
      FROM documents
      WHERE doc_id % 61 = 0 AND n_chars >= 60
    )
    SELECT p.probe_id, p.probe,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(d.doc_id) AS BIGINT) AS first_doc,
           CAST(max(d.doc_id) AS BIGINT) AS last_doc
    FROM probes p JOIN documents d ON contains(d.text, p.probe)
    GROUP BY 1, 2
    """,
    tags=("text", "llm", "join"),
)
def text_substring_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination probe: a small set of benchmark
    strings (deterministic 30-char slices of selected documents — in
    production, eval-set canaries) is checked for VERBATIM containment
    in every corpus document. Substring containment has no join key, so
    this is the one shape that legitimately plans a
    BroadcastNestedLoopJoin: the probe dimension broadcasts and every
    document row evaluates contains() against the handful of probes —
    the plan every other query here rightly avoids, correct ONLY
    because one side is tiny. Complements text_contamination (shingle
    overlap, catches paraphrase) with the exact-match gate run first.

    Scale: cost is |corpus| × |probes| contains() calls, all codegen,
    zero shuffles beyond the final aggregate. With thousands of probes
    switch to an Aho-Corasick pass inside mapInPandas — the plumbing
    (broadcast probe set, per-batch scan) is identical."""
    d = load_table(spark, sf_dir, "documents")
    probes = d.where((F.col("doc_id") % 61 == 0) & (F.col("n_chars") >= 60)).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", 11, 30).alias("probe"),
    )
    hits = d.join(
        F.broadcast(probes), F.col("text").contains(F.col("probe"))
    )
    return hits.groupBy("probe_id", "probe").agg(
        F.count("*").cast("bigint").alias("n_hits"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


@register(
    "scan_recursive_glob",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    WHERE event_id % 3 <> 2
    GROUP BY 1
    """,
    tags=("scan", "format"),
)
def scan_recursive_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy-directory ingestion: parquet parts are scattered across
    NESTED subdirectories (batch=a/, batch=b/sub/) alongside decoy
    .json and .txt files a naive directory read would trip over or a
    flat read would miss. recursiveFileLookup walks the tree (ignoring
    partition-discovery semantics) and pathGlobFilter admits only
    *.parquet — together they express 'ingest every parquet under this
    prefix, skip everything else', the posture for vendor-dropped or
    hand-organized data lakes. The oracle states the expected rows
    declaratively; the hash match proves the glob selected exactly the
    parquet members.

    Scale: file listing is driver-side metadata (parallelized by Spark
    for large trees via InMemoryFileIndex); the decoys cost nothing
    because they are filtered by NAME before any footer is read."""
    base = scratch_path("recursive_glob_events")
    shutil.rmtree(base, ignore_errors=True)
    src = load_table(spark, sf_dir, "events")
    keep = src.where(F.col("event_id") % 3 != 2)
    keep.where(F.col("event_id") % 3 == 0).write.parquet(
        os.path.join(base, "batch=a")
    )
    keep.where(F.col("event_id") % 3 == 1).write.parquet(
        os.path.join(base, "batch=b", "sub")
    )
    for decoy in ("batch=a/notes.txt", "batch=b/sub/schema.json", "README.txt"):
        path = os.path.join(base, decoy)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write('{"not": "parquet"}\n')
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(base)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
    )


@register(
    "win_concurrent_sweep",
    oracle="""
    WITH sess AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS e,
             event_id
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta, 0 AS kind, event_id FROM sess
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta, 1 AS kind, event_id FROM sess
    ),
    swept AS (
      SELECT event_type, t, delta,
             CAST(sum(delta) OVER (PARTITION BY event_type
                  ORDER BY t, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS live
      FROM pts
    )
    SELECT event_type,
           CAST(max(live) AS BIGINT) AS peak_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_sessions
    FROM swept GROUP BY 1
    """,
    tags=("window", "timeseries"),
)
def win_concurrent_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line: each event opens a 5-minute
    session interval; intervals unpivot to +1 (open) / −1 (close)
    boundary points, a running sum over the time-ordered boundary
    stream counts live sessions at every instant, and the per-type
    maximum is the peak. Close points sort AFTER open points at the
    same timestamp (kind tiebreak), so back-to-back sessions at the
    same instant count as overlapping — the convention stated, pinned,
    and mirrored in the oracle. This is THE capacity-planning query
    (max simultaneous users/connections) and the standard O(n log n)
    alternative to quadratic interval self-joins.

    Scale: the boundary stream is 2n rows with a per-type window —
    partitioned, not global. At 100 TB, pre-bucket time into
    coarse epochs and run the sweep per (type, epoch) with epoch-edge
    carry-in (the running count at an epoch boundary is the sum of all
    earlier deltas — one extra aggregate), keeping window partitions
    bounded."""
    ev = load_table(spark, sf_dir, "events")
    sess = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
        "event_id",
    )
    pts = sess.select(
        "event_type",
        F.col("s").alias("t"),
        F.lit(1).alias("delta"),
        F.lit(0).alias("kind"),
        "event_id",
    ).unionAll(
        sess.select(
            "event_type",
            F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
            F.lit(1).alias("kind"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.withColumn("live", F.sum("delta").over(w).cast("bigint"))
    return swept.groupBy("event_type").agg(
        F.max("live").cast("bigint").alias("peak_concurrency"),
        (F.count("*") / 2).cast("bigint").alias("n_sessions"),
    )
