"""Sampling invariants: seed determinism, fraction tolerance, stratified
fractions, split disjointness/coverage/stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_sample_deterministic_and_sized(spark, sf_dir):
    a = SPECS["sample_fraction"].fn(spark, sf_dir)
    b = SPECS["sample_fraction"].fn(spark, sf_dir)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb, "same seed must give the same sample"
    total = load_table(spark, sf_dir, "lineitem").count()
    frac = len(ra) / total
    assert 0.07 <= frac <= 0.13, frac


def test_stratified_fractions(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    totals = {r["l_returnflag"]: r["n"] for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    sampled = {
        r["l_returnflag"]: r["n"]
        for r in SPECS["sample_stratified"].fn(spark, sf_dir)
        .groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert 0.1 < sampled["N"] / totals["N"] < 0.3
    assert sampled.get("A", 0) / totals["A"] < 0.12


def test_train_test_split_properties(spark, sf_dir):
    split = SPECS["train_test_split"].fn(spark, sf_dir)
    rows = split.collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n, "every doc assigned exactly once"
    frac_train = sum(1 for r in rows if r["split"] == "train") / n
    assert 0.7 <= frac_train <= 0.9
    # repartitioning must not change assignments (hash-of-key, not RNG)
    d = load_table(spark, sf_dir, "documents").repartition(17)
    tag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    again = {
        r["doc_id"]: r["split"]
        for r in d.select(
            "doc_id", F.when(tag < "cccd", "train").otherwise("test").alias("split")
        ).collect()
    }
    assert {r["doc_id"]: r["split"] for r in rows} == again
    # and Python's hashlib reproduces the assignment (engine-portable)
    import hashlib

    for r in rows[:200]:
        expect = (
            "train"
            if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4] < "cccd"
            else "test"
        )
        assert r["split"] == expect
