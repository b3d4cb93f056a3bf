"""Round-6 third wave: semantic invariants for the statistics /
resampling / training / re-ranking queries (value-level correctness vs
DuckDB lives in tests/test_oracle.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_jarque_bera_nonnegative(spark, sf_dir):
    for r in SPECS["stat_jarque_bera"].fn(spark, sf_dir).collect():
        assert r["jb_stat"] >= 0.0


def test_mutual_info_bounds(spark, sf_dir):
    rows = SPECS["stat_mutual_info"].fn(spark, sf_dir).collect()
    mi = rows[0]["mi"]
    assert all(abs(r["mi"] - mi) < 1e-9 for r in rows)  # repeated constant
    nx = len({r["flag"] for r in rows})
    ny = len({r["status"] for r in rows})
    assert -1e-6 <= mi <= min(math.log(nx), math.log(ny)) + 1e-6


def test_cramers_v_bounds(spark, sf_dir):
    r = SPECS["stat_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0 + 1e-9
    assert r["chi2"] >= 0.0
    assert r["df"] == 8  # (5 priorities - 1) * (3 statuses - 1)


def test_bootstrap_replicates_concentrate(spark, sf_dir):
    """Poisson(1) weights: every replicate's effective n is within a few
    percent of the input size, and the replicate means straddle the true
    mean (the whole point of the bootstrap distribution). Windowless."""
    df = SPECS["stat_bootstrap_ci"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = df.collect()
    assert len(rows) == 20
    from etl_caic_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    true_mean = (
        li.agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        ).collect()[0][0]
        / n
        / 100.0
    )
    means = [r["mean_rep"] for r in rows]
    for r in rows:
        assert abs(r["n_eff"] - n) < 0.05 * n
    assert min(means) < true_mean < max(means)
    half_width = (max(means) - min(means)) / 2
    assert half_width < 0.05 * true_mean  # resampling noise, not chaos


def test_crosscorr_is_correlation_at_lag0(spark, sf_dir):
    rows = {r["lag"]: r for r in SPECS["ts_crosscorr"].fn(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(-7, 8))
    for r in rows.values():
        assert -1.0 - 1e-6 <= r["ccf"] <= 1.0 + 1e-6
    # daily count and daily revenue are strongly positively correlated
    assert rows[0]["ccf"] > 0.5


def test_cusum_segments_partition_the_series(spark, sf_dir):
    rows = SPECS["ts_cusum_changepoint"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    # ordered by |S| descending
    s = [abs(r["s_num"]) for r in rows]
    assert s == sorted(s, reverse=True)


def test_ols_multi_fit_is_sane(spark, sf_dir):
    r = SPECS["ml_ols_multi"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["r2"] <= 1.0
    # OLS with intercept passes through the sample means:
    # b0 + b1*mean(x1) + b2*mean(x2) == mean(y) (up to coef rounding)
    from etl_caic_spark.sources import load_table

    m = (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.avg(F.col("l_quantity").cast("bigint")).alias("mx1"),
            F.avg(F.round(F.col("l_discount") * 1000000).cast("bigint")).alias(
                "mx2"
            ),
            F.avg(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "my"
            ),
        )
        .collect()[0]
    )
    fitted = r["b0"] + r["b1"] * m["mx1"] + r["b2"] * m["mx2"]
    assert abs(fitted - m["my"]) < max(1e-4 * abs(m["my"]), 1.0)


def test_decision_stump_counts_consistent(spark, sf_dir):
    rows = SPECS["ml_decision_stump"].fn(spark, sf_dir).collect()
    n = rows[0]["nl"] + rows[0]["nr"]
    p = rows[0]["pl"] + rows[0]["pr"]
    for r in rows:
        assert r["nl"] + r["nr"] == n
        assert r["pl"] + r["pr"] == p
        assert 0 <= r["pl"] <= r["nl"] and 0 <= r["pr"] <= r["nr"]
        assert 0.0 <= r["gini_split"] <= 0.5 + 1e-9
    # argmax purity == argmin gini (same objective, two encodings)
    best_purity = max(rows, key=lambda r: (r["purity_micro"], -r["t"]))
    best_gini = min(rows, key=lambda r: (r["gini_split"], r["t"]))
    assert best_purity["t"] == best_gini["t"]


def test_mmr_diversifies(spark, sf_dir):
    """The MMR picks must (a) start with the highest-relevance candidate,
    (b) be distinct, and (c) each scored pick's objective must dominate
    a straight top-k-by-relevance alternative's objective at that step
    (greedy optimality of the argmax)."""
    rows = sorted(
        SPECS["rag_mmr_rerank"].fn(spark, sf_dir).collect(),
        key=lambda r: r["pick"],
    )
    assert [r["pick"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 5
    assert rows[0]["maxsim_micro"] == 0
    rels = [r["rel_micro"] for r in rows]
    assert rels[0] == max(rels)
    for r in rows[1:]:
        assert r["mmr_score"] == 7 * r["rel_micro"] - 3 * r["maxsim_micro"]
