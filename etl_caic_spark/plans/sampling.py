"""Sampling + synthetic-source surface (milestone M13) — the remaining
training-data-pipeline staples: Bernoulli sampling, stratified sampling,
train/test splits (all seed-deterministic; engine-specific RNG → rows-only
with pytest invariants), and a generate-at-scale synthetic source whose
arithmetic is SQL-portable and therefore fully oracled."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "sample_fraction",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 4) < '199a'
    """,
    tags=("sampling",),
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample of lineitem via key-hash banding: keep a row
    iff the first 4 hex chars of md5(l_orderkey-l_linenumber) fall below
    0x199a (6554/65536 = 10.0006%). Partition-parallel, no shuffle, and —
    unlike ``df.sample()``, whose RNG stream is engine- and
    partition-layout-specific — exactly reproducible by any engine, so the
    DuckDB oracle matches row-for-row. This is the production sampling
    recipe for training corpora: re-runs, backfills, and other engines all
    agree on the sampled set."""
    li = load_table(spark, sf_dir, "lineitem")
    tag = F.substring(
        F.md5(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        4,
    )
    return li.where(tag < "199a").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 4)
          < CASE l_returnflag WHEN 'A' THEN '0ccd'
                              WHEN 'N' THEN '3333'
                              WHEN 'R' THEN '0ccd'
                              ELSE '0000' END
    """,
    tags=("sampling",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with a per-stratum rate (A: 5%, N: 20%, R: 5%) —
    the class-rebalancing primitive — via the same md5-of-key banding as
    ``sample_fraction``, with the band threshold chosen per l_returnflag
    (0x0ccd = 5.0003%, 0x3333 = 19.9997%). Exactly reproducible across
    engines and partitionings, unlike ``sampleBy``'s RNG."""
    li = load_table(spark, sf_dir, "lineitem")
    tag = F.substring(
        F.md5(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        4,
    )
    thr = (
        F.when(F.col("l_returnflag") == "A", "0ccd")
        .when(F.col("l_returnflag") == "N", "3333")
        .when(F.col("l_returnflag") == "R", "0ccd")
        .otherwise("0000")
    )
    return li.where(tag < thr).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@register(
    "train_test_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
    tags=("sampling",),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 split by key hash — reproducible regardless of
    partitioning (unlike randomSplit, whose assignment depends on
    partition layout; hash-of-key is the production-grade split for
    training corpora). The hash is md5 of the stringified key, thresholded
    on the first 4 hex chars (0xcccd/0x10000 = 80.00%), so any engine —
    including the DuckDB oracle — reproduces the assignment exactly."""
    d = load_table(spark, sf_dir, "documents")
    tag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return d.select(
        "doc_id",
        F.when(tag < "cccd", "train").otherwise("test").alias("split"),
    )


@register(
    "synthetic_source",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           CAST(i * 2654435761 % 97 AS BIGINT) AS cat_id,
           CAST((i * 1103515245 + 12345) % 2147483648 AS BIGINT) AS noise,
           round(((i * 1103515245 + 12345) % 2147483648) / 2147483648.0, 6)
             AS uniform,
           'user_' || CAST(i % 1000 AS VARCHAR) AS user_tag
    FROM generate_series(0, 9999) t(i)
    """,
    tags=("source", "synthetic"),
)
def synthetic_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate-at-scale synthetic source: spark.range + arithmetic
    hashing (LCG constants) — no files, no driver data, partitionable to
    any size (spark.range(1e12) distributes). The 100 TB benchmarking
    source; arithmetic is SQL-portable, so fully oracled."""
    r = spark.range(0, 10000).withColumnRenamed("id", "i")
    i = F.col("i")
    lcg = (i * 1103515245 + 12345) % 2147483648
    return r.select(
        i.alias("id"),
        (i * 2654435761 % 97).alias("cat_id"),
        lcg.alias("noise"),
        F.round(lcg / 2147483648.0, 6).alias("uniform"),
        F.concat(F.lit("user_"), (i % 1000).cast("string")).alias("user_tag"),
    )
