"""Scale-pattern tests: bucketed joins must plan without a shuffle;
salted aggregation/join must produce identical results to the direct
form. These pin the 100 TB design claims (SURVEY.md §7.4.6) to observable
plan/result properties at test scale."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_caic_spark.operators.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)
from etl_caic_spark.operators.skew import salted_groupby_sum, salted_join
from etl_caic_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    n_rows = j.count()
    assert n_rows == load_table(spark, sf_dir, "lineitem").count()
    assert exchange_count(j) == 0, "bucketed join must not shuffle"
    # the same join on plain parquet DOES shuffle (merge hint pins SMJ so
    # the comparison is like-for-like)
    li = load_table(spark, sf_dir, "lineitem").hint("merge")
    o = load_table(spark, sf_dir, "orders")
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"], "inner")
    plain.count()
    assert exchange_count(plain) > 0


def test_salted_groupby_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        (r["l_returnflag"],): (round(r["s"], 2), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (round(r["sum_l_quantity"], 2), r["n_rows"])
        for r in salted_groupby_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert direct == salted


def test_salted_join_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    direct = (
        li.join(p, li["l_partkey"] == p["p_partkey"], "inner")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, p, "l_partkey", "p_partkey", salt_n=8)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_plan_has_salt_explode(spark, sf_dir):
    """The registered join_salted_skew query must actually plan the salted
    shape: an explode(sequence) replicating the build side, and a join
    condition on BOTH the natural key and _salt (so the hot key's rows
    hash to salt_n distinct buckets)."""
    from etl_caic_spark.registry import all_specs

    q = all_specs()["join_salted_skew"].fn(spark, sf_dir)
    optimized = q._jdf.queryExecution().optimizedPlan().toString()
    # constant folding collapses sequence(0, 7) to a literal array; the
    # Generate-explode node producing _salt is the salting signature
    assert "Generate explode(" in optimized, optimized
    assert "[_salt#" in optimized, optimized
    # join condition carries both equi-keys
    import re

    join_lines = [l for l in optimized.splitlines() if "Join Inner" in l]
    assert join_lines and all(
        "_salt" in l and "custkey" in l for l in join_lines
    ), join_lines


def test_ann_queries_never_plan_all_pairs(spark, sf_dir):
    """The ANN family's scale claim is 'never all-pairs': candidate
    generation must plan as equi-joins (bucket/band/partition keys), with
    the ONLY nested-loop join allowed being the broadcast of a tiny
    centroid/query dimension. A CartesianProduct anywhere means a config
    regression re-introduced the quadratic path."""
    from etl_caic_spark.registry import all_specs

    specs = all_specs()
    for name in ("sim_lsh_cosine", "dedup_minhash_md5", "dedup_simhash_md5"):
        plan = (
            specs[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, f"{name} plans a cross product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )
    # IVF: the centroid probe IS a (broadcast) cross join of |queries| x
    # |labels| — tiny by construction; the corpus-side candidate scan must
    # still be an equi-join, so a plain CartesianProduct stays forbidden.
    plan = (
        specs["sim_topk_ivf_exact"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_stop_shingle_cap_bounds_hot_buckets(spark):
    from etl_caic_spark.operators.dedup import ngram_jaccard_pairs

    # 30 docs sharing one boilerplate phrase (a hot shingle) + unique tails:
    # uncapped, the boilerplate makes every pair a candidate; capped at
    # df <= 5, the hot shingles drop out and no pair survives.
    rows = [
        (i, "x", "s", f"common header boilerplate phrase unique{i} tail{i} word{i}")
        for i in range(30)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    uncapped = ngram_jaccard_pairs(
        d, "doc_id", "text", ["lang", "source"], k=3, threshold=0.2
    ).count()
    capped = ngram_jaccard_pairs(
        d, "doc_id", "text", ["lang", "source"], k=3, threshold=0.2,
        max_shingle_df=5,
    ).count()
    assert uncapped > 0
    assert capped == 0


def test_events_ts_filter_pushes_to_parquet_scan(spark, sf_dir):
    """The events loader casts ts (TIMESTAMP_NTZ in the current fixture) to
    session-TZ TimestampType; Catalyst must still rewrite a ts range
    predicate onto the scanned NTZ column so parquet row-group/page pruning
    works — at 100 TB a time-range scan that cannot push its bound reads
    the whole table. Pin it to the physical plan."""
    ev = load_table(spark, sf_dir, "events")
    plan = (
        ev.filter(F.col("ts") >= "2024-01-15")
        .select("event_id", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(ts" in ln for ln in pushed), pushed
    # and projection pruning: only the two selected columns reach the scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "value" not in read[0] and "props" not in read[0], read


def test_scratch_pid_dirs_are_pruned(tmp_path, monkeypatch):
    """Per-pid scratch dirs must not accumulate forever: dirs whose
    owning pid is dead are pruned on module init, live ones (including
    our own) are kept, and the atexit hook removes this process's own
    dirs (round-9 advice: pid-suffixed dirs were write-only)."""
    from etl_caic_spark import util

    monkeypatch.setattr(util, "REPO_TMP", str(tmp_path))
    dead = tmp_path / "fixture_p999999999"  # pid far past pid_max
    dead.mkdir()
    (dead / "f").write_text("x")
    own = tmp_path / f"fixture_p{os.getpid()}"
    own.mkdir()
    plain = tmp_path / "not_a_pid_dir"
    plain.mkdir()

    util._prune_dead_scratch()
    assert not dead.exists(), "dead-pid dir must be pruned"
    assert own.exists(), "own dir must survive the prune"
    assert plain.exists(), "non-pid dirs are out of scope"

    util._cleanup_own_scratch()
    assert not own.exists(), "atexit hook removes this process's dirs"
    assert plain.exists()


def test_scratch_dir_is_tracked_and_cleaned(tmp_path, monkeypatch):
    """mkdtemp scratch dirs have random names no other process can
    identify, so each process must delete its own at exit."""
    from etl_caic_spark import util

    monkeypatch.setattr(util, "REPO_TMP", str(tmp_path))
    monkeypatch.setattr(util, "_OWN_SCRATCH_DIRS", [])
    d1 = util.scratch_dir("ckpt_")
    d2 = util.scratch_dir("caic_forecasts_")
    assert os.path.isdir(d1) and os.path.isdir(d2)
    foreign = tmp_path / "ckpt_foreign"
    foreign.mkdir()  # another live process's dir: must survive
    util._cleanup_own_scratch()
    assert not os.path.exists(d1) and not os.path.exists(d2)
    assert foreign.exists()
