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


@register("sample_fraction", oracle=None, tags=("sampling",))
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (10%) of lineitem — partition-parallel,
    no shuffle; same seed → same rows (pytest pins determinism and
    fraction tolerance). Spark's sampler RNG is engine-specific → no SQL
    oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register("sample_stratified", oracle=None, tags=("sampling",))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: different fraction per l_returnflag stratum
    (sampleBy) — the class-rebalancing primitive."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sampleBy(
        "l_returnflag", fractions={"A": 0.05, "N": 0.2, "R": 0.05}, seed=42
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


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
