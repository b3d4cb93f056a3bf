"""Round-2 operator tests: deterministic LSH-cosine ANN, hypertable
rollups, repetition signals, URL canonicalization, SCD2 history."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_caic_spark.operators import lsh as L
from etl_caic_spark.operators import timeseries as TS
from etl_caic_spark.operators.text_analysis import repetition_signals
from etl_caic_spark.operators.urls import canonicalize_url

SF_DIR = "/root/testdata/sf0.001"


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_lsh_pairs_subset_of_brute_force(spark):
    """Every LSH-verified pair must appear in the brute-force pair set at
    the same threshold (LSH can miss pairs, never invent them)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # Anchor config (16 planes / 4-bit bands): collision-rich on a tiny
    # corpus so the subset property is actually exercised; the operator
    # defaults are the sparse scale config (64/16) and would emit ~0
    # candidate pairs on random small-SF vectors.
    pairs = L.lsh_cosine_pairs(
        e, "vec_id", "embedding", threshold=0.3, planes=16, band_bits=4
    ).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in e.collect()}
    assert len(pairs) > 0
    for r in pairs:
        c = _cosine(vecs[r["id_a"]], vecs[r["id_b"]])
        assert r["id_a"] < r["id_b"]
        assert round(c, 6) >= 0.3
        assert abs(round(c, 6) - r["cosine"]) < 1e-9


def test_lsh_signatures_deterministic(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    s1 = sorted(map(tuple, L.hyperplane_signatures(e).collect()))
    s2 = sorted(map(tuple, L.hyperplane_signatures(e).collect()))
    assert s1 == s2
    # default 64 planes / 16-bit bands -> 4 band rows per vector
    assert len(s1) == 50 * 4


def test_rollup_partials_compose(spark):
    """Day-grain rollup built hour<-minute<-raw equals a direct day
    aggregation over the raw table."""
    from etl_caic_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    hier = TS.rollup_hierarchy(ev, "ts", ("event_type",), "value")
    day = {
        (r["bucket"], r["event_type"]): r
        for r in hier.filter(F.col("grain") == "day").collect()
    }
    direct = (
        ev.withColumn("bucket", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("bucket", "event_type")
        .agg(
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )
    assert len(direct) == len(day)
    for r in direct:
        h = day[(r["bucket"], r["event_type"])]
        assert h["n"] == r["n"]
        assert abs(h["sum_value"] - r["sum_value"]) < 1e-6
        assert h["min_value"] == r["min_value"]
        assert h["max_value"] == r["max_value"]


def test_repetition_signals_hand_case(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b"),  # top word 3/4; top bigram "a a" 2/3
            Row(doc_id=2, text="x y"),  # all distinct
            Row(doc_id=3, text="solo"),  # single word, no bigrams
        ]
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["n_words"] == 4 and out[1]["top_word_n"] == 3
    assert out[1]["top_word_frac"] == 0.75
    assert out[1]["top_bigram_n"] == 2
    assert abs(out[1]["top_bigram_frac"] - round(2 / 3, 6)) < 1e-9
    assert out[2]["uniq_ratio"] == 1.0 and out[2]["top_bigram_n"] == 1
    assert out[3]["n_words"] == 1 and out[3]["top_bigram_n"] == 0


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTPS://Ex.COM:443/A/?utm_source=x&b=2&a=1#f", "https://ex.com/A?a=1&b=2"),
        ("http://ex.com:80/path/", "http://ex.com/path"),
        ("https://ex.com/", "https://ex.com"),
        ("https://ex.com/p?ref=abc", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port kept
    ],
)
def test_canonicalize_url(spark, raw, expected):
    got = (
        spark.range(1)
        .select(canonicalize_url(F.lit(raw)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == expected


def test_scd2_history_hand_case(spark):
    from etl_caic_spark.plans import pipelineq  # noqa: F401
    from etl_caic_spark.registry import REGISTRY

    out = REGISTRY["scd2_history"].fn(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        ordered = sorted(user_rows, key=lambda r: r["version"])
        # exactly one open (current) version per user, and it is the last
        assert [r["is_current"] for r in ordered].count(True) == 1
        assert ordered[-1]["is_current"]
        for prev, nxt in zip(ordered, ordered[1:]):
            # contiguous validity; no consecutive duplicate states
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["event_type"] != nxt["event_type"]


def test_python_datasource_partition_parallel(spark):
    """The custom source exposes its InputPartitions to Spark: 8 declared
    partitions => 8 scan tasks, and the strided id space gives each an
    equal slice (executor-parallel, no driver bottleneck)."""
    from etl_caic_spark.sources.pyds import register_synthseq

    register_synthseq(spark)
    df = spark.read.format("synthseq").option("n", 800).option("parts", 8).load()
    assert df.rdd.getNumPartitions() == 8
    per_part = df.groupBy("part").count().collect()
    assert len(per_part) == 8
    assert all(r["count"] == 100 for r in per_part)


def test_hll_sketch_estimates_close_to_exact(spark):
    from etl_caic_spark.plans import udfq  # noqa: F401
    from etl_caic_spark.registry import REGISTRY

    rows = REGISTRY["agg_hll_sketch"].fn(spark, SF_DIR).collect()
    per_type = [r for r in rows if r["event_type"] != "__all__"]
    assert len(per_type) >= 3
    for r in per_type:
        rel = abs(r["est_distinct"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        assert rel <= 0.05, (r["event_type"], r["est_distinct"], r["exact_distinct"])
    # the merged sketch's estimate is >= the largest per-type estimate
    total = [r for r in rows if r["event_type"] == "__all__"][0]
    assert total["est_distinct"] >= max(r["est_distinct"] for r in per_type)
