"""UDF-surface queries (milestone M5): scalar pandas UDF, grouped-agg
pandas UDF, applyInPandas grouped-map, and mapInPandas — each oracled
where the computation is SQL-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators import udfs as U
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_orderkey % 6 = 0
    """,
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF; elementwise double math is
    bit-identical to the SQL expression, so no rounding is needed."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 6 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        U.charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS qty_weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (quantity-weighted mean price), rounded on
    both sides (summation order differs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(U.weighted_avg_udf("l_extendedprice", "l_quantity"), 4).alias(
            "qty_weighted_price"
        )
    )


@register(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id, value,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    QUALIFY count(*) OVER (PARTITION BY user_id) >= 2
    """,
    tags=("udf",),
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas per-user z-score — the UDTF-shaped
    extension point (oracle: SQL window twin)."""
    ev = load_table(spark, sf_dir, "events")
    return U.zscore_per_group(ev, "user_id", "value")


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
    FROM events
    """,
    tags=("udf",),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batch-iterator transform (regex JSON field extraction —
    equivalent to the SQL JSON path on this corpus)."""
    ev = load_table(spark, sf_dir, "events")
    return U.parse_props_batches(ev)


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))) // 100
             AS net_cents
    FROM lineitem
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow batch transform (operators/udfs.net_price_arrow_batches):
    discounted net price in exact integer cents, computed with pyarrow
    compute kernels on RecordBatches — no pandas materialization. The
    integer formulation makes the result independent of Arrow batch
    boundaries, so it hash-matches the SQL twin."""
    li = load_table(spark, sf_dir, "lineitem")
    return U.net_price_arrow_batches(li)


@register(
    "udf_python_udtf",
    oracle="""
    WITH words AS (
      SELECT doc_id, word
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id % 21 = 0)
      WHERE word <> ''
    ),
    counts AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS n
      FROM words GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, word, n,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY n DESC, word) AS rnk
      FROM counts
    )
    SELECT doc_id, CAST(rnk AS INT) AS rnk, word, n
    FROM ranked WHERE rnk <= 3
    """,
    tags=("udf", "udtf"),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 `@udtf` — one input row expands to a
    variable number of output rows, computed in Python): top-3 words per
    document with deterministic (count desc, word) ordering. This is the
    lateral-expansion API lane, complementing applyInPandas (grouped) and
    mapInArrow (batch): use a UDTF when each ROW independently yields a
    small table and the logic wants plain Python. The word counting is
    exact, so the SQL window oracle hash-matches. UDTFs evaluate
    row-at-a-time — keep them off the 100 TB hot path (this corpus's doc
    slice is 1/21) and prefer HOF/explode formulations (text_stats,
    vocab_topk) when expressible."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, rnk int, word string, n bigint")
    class TopWords:
        def eval(self, doc_id: int, text: str):
            words = [w for w in (text or "").split(" ") if w]
            best = sorted(
                Counter(words).items(), key=lambda kv: (-kv[1], kv[0])
            )[:3]
            for i, (w, n) in enumerate(best, start=1):
                yield doc_id, i, w, n

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 21 == 0)
        .select("doc_id", "text")
    )
    # lateral-join the UDTF over the filtered docs
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("top_words", TopWords)
    return spark.sql(
        "SELECT t.* FROM _udtf_docs, LATERAL top_words(doc_id, text) t"
    )


@register(
    "agg_hll_sketch",
    tags=("agg", "sketch"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark 3.5+):
    per-type user-distinct sketches are built ONCE, then re-merged with
    hll_union_agg to the global level — the two-level compose that lets a
    100 TB pipeline keep pre-aggregated distinct-count partials per
    partition/day and answer rollups without rescanning facts (same
    partial-compose discipline as rollup_timeseries, but for DISTINCT).
    No SQL oracle: DuckDB's approx_distinct uses a different HLL
    implementation, so estimates differ by construction — correctness is
    the ±5%-of-exact pytest (tests/test_round2_ops.py)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    per_type_out = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        "exact_distinct",
    )
    total = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        F.lit(None).cast("bigint").alias("exact_distinct"),
    )
    return per_type_out.unionByName(total)
