"""Round-6 fourth wave: semantic invariants for the recommender /
modularity / encoding / attribution / resampling / robust-trend queries
(value-level correctness vs DuckDB lives in tests/test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_item_knn_symmetric_scores_and_topk(spark, sf_dir):
    df = SPECS["rec_item_knn"].fn(spark, sf_dir)
    rows = df.collect()
    by_pair = {(r["item"], r["neighbor"]): r for r in rows}
    for r in rows:
        assert 1 <= r["rank"] <= 5
        assert 0 < r["cos_micro"] <= 1000000
        # cosine is symmetric: if the reverse pair also made top-5, the
        # score must be identical
        rev = by_pair.get((r["neighbor"], r["item"]))
        if rev:
            assert rev["cos_micro"] == r["cos_micro"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_modularity_bounds_and_edge_accounting(spark, sf_dir):
    rows = SPECS["graph_modularity"].fn(spark, sf_dir).collect()
    q = rows[0]["modularity"]
    assert all(abs(r["modularity"] - q) < 1e-9 for r in rows)
    assert -0.5 <= q <= 1.0
    for r in rows:
        # within-community directed edges cannot exceed the degree mass
        assert 0 <= r["e_within"] <= r["d_c"]
        assert r["size"] >= 1
    # LPA communities on a sparse interaction graph must score positive
    assert q > 0


def test_woe_iv_consistency(spark, sf_dir):
    rows = SPECS["feat_woe_iv"].fn(spark, sf_dir).collect()
    iv = rows[0]["iv_total"]
    # IV is a sum of (p-q)*ln(p/q)-style terms: nonnegative up to the
    # +0.5 smoothing's perturbation on near-equal cells
    assert iv >= -1e-3
    assert all(abs(r["iv_total"] - iv) < 1e-9 for r in rows)
    assert len(rows) == 5  # one row per priority category


def test_knn_classify_shapes(spark, sf_dir):
    rows = SPECS["ml_knn_classify"].fn(spark, sf_dir).collect()
    assert rows
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # one prediction per test vector
    assert all(i % 10 == 0 for i in ids)
    for r in rows:
        assert 1 <= r["votes"] <= 5
        assert r["correct"] == (1 if r["label_pred"] == r["label_true"] else 0)


def test_position_credits_sum_to_one(spark, sf_dir):
    rows = (
        SPECS["attrib_position_based"]
        .fn(spark, sf_dir)
        .groupBy("purchase_id", "k")
        .agg(F.sum("credit_micro").alias("total"))
        .collect()
    )
    assert rows
    for r in rows:
        # rounding of the middle share leaves at most (k-2)/2 micro drift
        assert abs(r["total"] - 1000000) <= max(1, r["k"])


def test_permutation_test_pvalue_valid(spark, sf_dir):
    rows = SPECS["stat_permutation_test"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    p = rows[0]["p_value"]
    assert all(abs(r["p_value"] - p) < 1e-9 for r in rows)
    assert 1 / 20 - 1e-9 <= p <= 1.0 + 1e-9
    obs = [r for r in rows if r["perm"] == 0][0]
    # permuted groups should be roughly the same size as observed
    for r in rows:
        assert abs(r["n_a"] - obs["n_a"]) < 0.1 * (obs["n_a"] + obs["n_b"])


def test_theil_sen_robustness_shape(spark, sf_dir):
    row = SPECS["ts_theil_sen"].fn(spark, sf_dir).collect()[0]
    n = row["n_days"]
    assert row["n_pairs"] == n * (n - 1) // 2
    # slope of a stationary daily-count series is near zero (micro units)
    assert abs(row["slope_micro_med"]) < 1000000  # |slope| < 1 order/day
    # intercept is a median residual: near the series' typical level
    assert row["intercept_micro_med"] > 0
