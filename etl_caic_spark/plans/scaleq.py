"""Scale-pattern queries: the skew-salting and bucketed-join operators
(operators/skew.py, operators/bucketing.py) exposed as driver-checkable
queries — the RESULT is oracled against the plain formulation (salting /
bucketing must be invisible in the output), and the plan-shape properties
(spread partials, zero Exchange) stay pytest-asserted in
tests/test_scale_patterns.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.bucketing import bucketed_join, write_bucketed
from etl_caic_spark.operators.skew import salted_groupby_sum
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_l_quantity,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("agg", "skew", "scale"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the MOST skewed key pair in the
    dataset (a handful of (returnflag, linestatus) values for the whole
    fact table): phase 1 spreads each hot key over 16 salted reducers,
    phase 2 merges partials. The oracle is the PLAIN group-by — salting
    must not change results. l_quantity is integer-valued, so the
    two-phase double sum is exact (no summation-order hazard)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_groupby_sum(li, ["l_returnflag", "l_linestatus"], "l_quantity")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        F.col("n_rows").cast("bigint").alias("n"),
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 7 = 0
    """,
    tags=("join", "skew", "scale"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.salted_join): the small dimension
    (customer) is replicated 8× over salt ids, the fact side (orders) gets
    a deterministic salt, and the join key becomes (key, salt) — one hot
    hash bucket becomes 8. The oracle is the PLAIN join: salting must be
    invisible in the result. tests/test_scale_patterns.py asserts the
    salt-explode plan shape (explode(sequence) on the build side and the
    composite join condition). At 100 TB this is the manual fallback when
    AQE's skew split can't help (e.g. a single hot key inside one
    partition-sized row group, or a broadcast-disabled build side)."""
    from etl_caic_spark.operators.skew import salted_join

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = salted_join(orders, cust, "o_custkey", "c_custkey", salt_n=8)
    return j.select("o_orderkey", "o_custkey", "c_name", "o_totalprice")


@register(
    "join_bucketed",
    oracle="""
    SELECT c.c_custkey, c.c_name, CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
    tags=("join", "bucket", "scale"),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-bucket co-located join: both sides written bucketed by the
    join key (8 buckets) then joined — Spark plans a SortMergeJoin whose
    children read pre-bucketed files with ZERO Exchange (the property
    tests/test_scale_patterns.py asserts on this exact pattern). The
    oracle is the plain join+aggregate: bucketing must be invisible in
    the result. At 100 TB this is THE fact⋈fact pattern: pay the shuffle
    once at write time, never per query."""
    import shutil

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for tbl in ("bq_customer", "bq_orders"):
        # A location left behind by a previous session isn't in this
        # session's catalog, so overwrite alone can't reclaim it.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(
            warehouse.removeprefix("file:") + "/" + tbl, ignore_errors=True
        )
    write_bucketed(cust, "bq_customer", "c_custkey", 8)
    write_bucketed(orders, "bq_orders", "o_custkey", 8)
    joined = bucketed_join(spark, "bq_customer", "bq_orders", "c_custkey", "o_custkey")
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "compact_small_files",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_orderkey % 11 = 0
    """,
    tags=("sink", "maintenance", "scale"),
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every lake runs:
    a slice is first written fragmented (64 shuffle partitions → 64 tiny
    files, the pathological streaming-ingest layout), then compacted with
    a coalesce(4) rewrite and read back. The oracle is the source slice:
    compaction must be a pure layout change. coalesce (not repartition)
    avoids a shuffle on the rewrite — each output file concatenates
    existing partitions; at 100 TB this runs per-partition-directory with
    target file size ~ the FS block size."""
    import os
    import shutil

    from etl_caic_spark.util import scratch_path

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 11 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
    frag_dir = scratch_path("etl_caic_fragmented")
    compact_dir = scratch_path("etl_caic_compacted")
    shutil.rmtree(frag_dir, ignore_errors=True)
    shutil.rmtree(compact_dir, ignore_errors=True)
    li.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    n_frag = len([f for f in os.listdir(frag_dir) if f.endswith(".parquet")])
    frag.coalesce(4).write.mode("overwrite").parquet(compact_dir)
    n_comp = len([f for f in os.listdir(compact_dir) if f.endswith(".parquet")])
    assert n_comp < n_frag, (n_comp, n_frag)  # compaction must reduce file count
    return spark.read.parquet(compact_dir)


def _morton_sql(xcol: str, ycol: str, bits: int = 8) -> str:
    """Bit-interleave SQL shared by the oracle — x in even bits, y in odd."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey % 256 AS BIGINT) AS px,
           CAST(l_orderkey % 256 AS BIGINT) AS ox,
           CAST({_morton_sql('(l_partkey % 256)', '(l_orderkey % 256)')}
                AS BIGINT) AS zkey
    FROM lineitem WHERE l_orderkey % 23 = 0
    """,
    tags=("layout", "scale"),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two join/
    filter dimensions so ONE sort key preserves locality in BOTH — the
    data-layout trick behind multi-dimensional data skipping (sort by
    zkey before writing; parquet row-group min/max stats then prune
    selective predicates on EITHER dimension, verified against row-group
    footers in tests/test_layout.py). Pure integer bit arithmetic —
    identical shift/mask expressions on both engines, no UDF. At 100 TB
    z-ordering is a write-time layout choice: one extra sort per
    partition rewrite, amortized over every subsequent pruned scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 23 == 0
    )
    # l_orderkey, not l_suppkey, as the second dim: TPC-H derives suppkey
    # FROM partkey, so a partkey sort already clusters suppkey and
    # z-ordering would demonstrate nothing (caught by test_layout.py).
    px = (F.col("l_partkey") % 256).cast("bigint")
    sx = (F.col("l_orderkey") % 256).cast("bigint")
    zkey = F.lit(0).cast("bigint")
    for i in range(8):
        zkey = zkey + (
            F.shiftright(px.bitwiseAND(F.lit(1 << i)), i) * F.lit(1 << (2 * i))
        ) + (
            F.shiftright(sx.bitwiseAND(F.lit(1 << i)), i)
            * F.lit(1 << (2 * i + 1))
        )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        px.alias("px"),
        sx.alias("ox"),
        zkey.alias("zkey"),
    )


@register(
    "join_runtime_bloom",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) / 100.0, 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 300000
    GROUP BY 1
    """,
    tags=("join", "scale", "runtime-filter"),
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: a selective dim-side filter
    (o_totalprice > 300k keeps ~13% of orders) injects a bloom filter of
    the surviving join keys into the FACT-side scan, so most lineitem rows
    are dropped before the join's shuffle — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    ~13% that can match. Thresholds are lowered to engage the optimizer at
    test scale (probe side must normally exceed 10 GB — exactly the 100 TB
    regime); the injected `might_contain` predicate is asserted on the
    plan so the query fails loudly if the rewrite ever stops applying, and
    the oracle (plain join) pins that bloom false-positives never change
    results. Sum rides as integer cents of an exact-by-construction
    2-decimal column; one double division at the end.

    Confs are set/restored around plan construction only — the settings
    steer this plan's optimization and nothing else."""
    bloom_confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # engage at test scale; the default 10GB floor IS the target regime
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # broadcast would bypass the runtime-filter path entirely; at 100 TB
        # a 13%-of-orders build side is far past broadcast range anyway
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in bloom_confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        # The merge hint pins a shuffle join INDEPENDENT of the conf scope:
        # physical planning and AQE re-optimization run later, under the
        # restored default broadcast thresholds, and without the hint they
        # could broadcast the filtered orders side at test scale — correct
        # results, but the shuffle-side pruning this query exists to
        # exercise would silently vanish. (At 100 TB a 13%-of-orders build
        # side is far past broadcast range; the hint just makes test scale
        # plan like the target scale.)
        o = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 300000)
            .hint("merge")
        )
        out = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.round(
                    F.sum(F.round(F.col("l_extendedprice") * 100, 0))
                    / 100.0,
                    2,
                ).alias("total"),
            )
        )
        qe = out._jdf.queryExecution()
        # Materialize BOTH the optimized plan (bloom injection happens in
        # logical optimization) and the physical plan inside the conf
        # scope, then assert on the physical plan — the thing that runs.
        if "might_contain" not in qe.optimizedPlan().toString():
            raise AssertionError(
                "runtime bloom filter was not injected into the fact-side "
                "scan; check the optimizer.runtime.bloomFilter confs"
            )
        if "might_contain" not in qe.executedPlan().toString():
            raise AssertionError(
                "bloom filter predicate missing from the PHYSICAL plan — "
                "planning no longer happens under the conf scope"
            )
        # Later actions on `out` reuse this QueryExecution, bloom included.
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "join_shuffle_hash",
    oracle="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT))
                      AS BIGINT) / 100.0, 2) AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    tags=("join", "scale", "hint"),
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hinted shuffled-hash join: when the build side is too big to
    broadcast but small enough to hash per partition, SHJ skips the sort
    both SMJ children pay — at 100 TB that's the strategy for
    medium-dim ⋈ fact shapes where sorting the fact side dominates. The
    SHUFFLE_HASH hint pins the strategy and the plan is asserted, so a
    future Catalyst change that silently falls back to SMJ fails loudly
    here instead of costing a sort at scale. Balance sum rides as integer
    cents (exact); the plain-join oracle pins result equality."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").hint("shuffle_hash")
    out = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(
                F.sum(F.round(F.col("s_acctbal") * 100, 0)) / 100.0, 2
            ).alias("total_bal"),
        )
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "ShuffledHashJoin" not in plan:
        raise AssertionError(
            "SHUFFLE_HASH hint did not produce a ShuffledHashJoin "
            "(plan fell back to another strategy)"
        )
    return out
