"""Plan-shape and semantics tests for the round-5 additions
(retrieval/basket/NB/privacy/linkage/TS-part-2 families).

Correctness vs DuckDB is covered automatically by tests/test_oracle.py;
these tests pin the SCALE claims each docstring makes — broadcast where
promised, no cartesian products, pair counts bounded — plus a few
semantic properties an oracle row-match can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bm25_broadcasts_dims_and_takes_ordered(spark, sf_dir):
    df = SPECS["text_bm25_topk"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, "df/qterms/stats dims must broadcast"
    assert "TakeOrderedAndProject" in plan, (
        "global top-20 must plan as TakeOrderedAndProject, not a full sort"
    )
    assert "CartesianProduct" not in plan


def test_bm25_scores_monotone_in_query_term_mass(spark, sf_dir):
    rows = SPECS["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_pmi_pairs_formed_without_join_or_shuffle_explosion(spark, sf_dir):
    df = SPECS["text_pmi_bigrams"].fn(spark, sf_dir)
    # Bigram formation is arrays_zip on the word array — the optimized plan
    # must not contain a positional self-join of exploded tokens.
    plan = _optimized_plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert all(r["c_ab"] >= 5 for r in rows)


def test_containment_triangle_bounds(spark, sf_dir):
    rows = SPECS["dedup_containment"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert r["n_inter"] <= min(r["n_a"], r["n_b"])
        assert 10 * r["n_inter"] >= 8 * min(r["n_a"], r["n_b"])


def test_basket_pairs_bounded_by_basket_size(spark, sf_dir):
    """Pair generation is O(orders * k^2): with the part dim broadcast and
    max basket size k, the pair count can never exceed n_orders * k*(k-1)/2."""
    df = SPECS["basket_assoc_rules"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, "part dim must broadcast"
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .groupBy("l_orderkey")
        .count()
    )
    kmax = baskets.agg(F.max("count")).collect()[0][0]
    n_orders = baskets.count()
    total_pairs = (
        SPECS["basket_assoc_rules"].fn(spark, sf_dir).agg(F.sum("supp_ab")).collect()[0][0]
    )
    assert total_pairs <= n_orders * kmax * (kmax - 1) // 2


def test_basket_rule_stats_consistent(spark, sf_dir):
    for r in SPECS["basket_assoc_rules"].fn(spark, sf_dir).collect():
        assert r["ante"] < r["cons"]
        assert r["supp_ab"] <= min(r["supp_a"], r["supp_b"])
        assert 0 < r["confidence"] <= 1.0


def test_nb_model_is_full_grid_and_normalized(spark, sf_dir):
    rows = SPECS["ml_nb_train"].fn(spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    terms = {r["term"] for r in rows}
    assert len(rows) == len(langs) * len(terms), "model must be a full grid"
    # Smoothed probabilities per class must sum to ~1 (micros within
    # quantization error of the vocab size).
    import collections
    import math

    by_lang = collections.defaultdict(float)
    for r in rows:
        by_lang[r["lang"]] += math.exp(r["logp_micro"] / 1e6)
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-3, (lang, total)


def test_nb_classify_covers_test_split_and_beats_uniform(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_test = docs.filter(F.col("doc_id") % 7 == 0).count()
    rows = SPECS["ml_nb_classify"].fn(spark, sf_dir).collect()
    assert len(rows) == n_test, "exactly one prediction per test doc"
    # Word-soup text carries little lang signal, but the class prior does:
    # the argmax must at least match the majority-class rate.
    acc = sum(r["pred_lang"] == r["true_lang"] for r in rows) / len(rows)
    assert acc >= 0.2


def test_k_anonymity_class_sizes_add_up(spark, sf_dir):
    rows = SPECS["priv_k_anonymity"].fn(spark, sf_dir).collect()
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_customers
    import collections

    classes = collections.Counter(
        (r["c_nationkey"], r["c_mktsegment"], r["bal_band"]) for r in rows
    )
    for r in rows:
        k = classes[(r["c_nationkey"], r["c_mktsegment"], r["bal_band"])]
        assert r["k"] == k
        assert r["suppressed"] == (k < 5)


def test_pseudonymize_is_deterministic_and_key_hiding(spark, sf_dir):
    a = {r["cust_pseudo"]: r["n_orders"] for r in
         SPECS["priv_pseudonymize"].fn(spark, sf_dir).collect()}
    b = {r["cust_pseudo"]: r["n_orders"] for r in
         SPECS["priv_pseudonymize"].fn(spark, sf_dir).collect()}
    assert a == b, "same salt+key must pseudonymize identically across runs"
    assert all(len(p) == 16 for p in a)
    # Pseudonym must not leak the key: no pseudonym equals a raw custkey hex.
    o = load_table(spark, sf_dir, "orders")
    keys = {format(r["o_custkey"], "x") for r in o.select("o_custkey").distinct().collect()}
    assert not (set(a) & keys)


def test_sorted_neighborhood_is_linear_in_pairs(spark, sf_dir):
    df = SPECS["link_sorted_neighborhood"].fn(spark, sf_dir)
    n_parts = load_table(spark, sf_dir, "part").count()
    n_pairs = df.count()
    assert n_pairs <= 3 * n_parts, "SNM window of 3 bounds candidate pairs"
    for r in df.limit(50).collect():
        assert r["a_name"] != r["b_name"]
        assert 0 < r["dist"] <= 3


def test_seasonal_profile_broadcasts_onto_fact(spark, sf_dir):
    df = SPECS["ts_seasonal_decompose"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, "24-row seasonal profile must broadcast"
    rows = df.collect()
    for r in rows:
        assert abs(r["value"] - r["seasonal"] - r["residual"]) < 1e-6
        assert 0 <= r["hod"] <= 23


def test_churn_label_consistency(spark, sf_dir):
    rows = SPECS["ts_churn_label"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["n_events"] >= r["active_days"] >= 1
        # churned = timestamp gap > 7 days; days_silent is the DATE diff,
        # so the two can disagree by at most one calendar day.
        if r["churned"]:
            assert r["days_silent"] >= 7
        else:
            assert r["days_silent"] <= 8


def test_entity_resolution_covers_all_parts_and_closes_matches(spark, sf_dir):
    res = {r["p_partkey"]: r for r in
           SPECS["link_entity_resolution"].fn(spark, sf_dir).collect()}
    n_parts = load_table(spark, sf_dir, "part").count()
    assert len(res) == n_parts
    # Every matched pair must land in the same entity, and the canonical
    # id must be the min member of its cluster.
    pairs = SPECS["link_sorted_neighborhood"].fn(spark, sf_dir).collect()
    for p in pairs:
        assert res[p["a_key"]]["entity_id"] == res[p["b_key"]]["entity_id"]
    import collections

    clusters = collections.defaultdict(list)
    for k, r in res.items():
        clusters[r["entity_id"]].append(k)
    for eid, members in clusters.items():
        assert eid == min(members)
        for m in members:
            assert res[m]["is_canonical"] == (m == eid)


def test_snapshot_diff_classification_counts(spark, sf_dir):
    rows = SPECS["snapshot_diff"].fn(spark, sf_dir).collect()
    kinds = {r["change_type"] for r in rows}
    assert kinds == {"insert", "delete", "update"}
    for r in rows:
        if r["change_type"] == "insert":
            assert r["old_cents"] is None and r["new_cents"] is not None
        elif r["change_type"] == "delete":
            assert r["old_cents"] is not None and r["new_cents"] is None
        else:
            assert r["old_cents"] != r["new_cents"]


def test_mv_incremental_equals_direct_recompute(spark, sf_dir):
    """The oracle already proves this against DuckDB; this pins the same
    equality inside Spark so a DuckDB-side coincidence can't mask a bug."""
    import pyspark.sql.functions as SF

    inc = {r["n_nationkey"]: (r["n_orders"], r["revenue_cents"]) for r in
           SPECS["mv_join_incremental"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    full = (
        o.filter(SF.col("o_orderkey") % 100 != 13)
        .withColumn(
            "cents",
            SF.round(SF.col("o_totalprice") * 100).cast("bigint")
            + SF.when(SF.col("o_orderkey") % 10 == 0, SF.lit(500)).otherwise(0),
        )
        .join(c, SF.col("o_custkey") == SF.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(SF.count("*").alias("n"), SF.sum("cents").alias("cents"))
        .collect()
    )
    direct = {r["c_nationkey"]: (r["n"], r["cents"]) for r in full}
    assert inc == direct


def test_dp_noise_is_centered_and_bounded(spark, sf_dir):
    rows = SPECS["priv_dp_noisy_counts"].fn(spark, sf_dir).collect()
    errs = [r["noisy_count"] - r["true_count"] for r in rows]
    # Laplace(b=1): errors concentrate near 0; |err| > 15 has prob ~3e-7.
    assert all(abs(e) <= 15 for e in errs)
    assert any(e != 0 for e in errs)


def test_calendar_rollup_day_accounting(spark, sf_dir):
    rows = SPECS["dim_calendar_rollup"].fn(spark, sf_dir).collect()
    total_days = sum(r["n_days"] for r in rows)
    import pyspark.sql.functions as SF

    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        SF.datediff(
            SF.max(SF.col("o_orderdate").cast("date")),
            SF.min(SF.col("o_orderdate").cast("date")),
        )
    ).collect()[0][0]
    assert total_days == span + 1, "day spine must cover the span exactly"
    for r in rows:
        assert r["n_active_days"] <= r["n_days"]
        assert (r["n_orders"] == 0) == (r["n_active_days"] == 0)


def test_business_days_formula_vs_bruteforce():
    import datetime

    def g(d):
        j = (d - datetime.date(1970, 1, 5)).days
        return j // 7 * 5 + min(j % 7, 5)

    def brute(a, b):
        n = 0
        d = a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += datetime.timedelta(days=1)
        return n

    base = datetime.date(1995, 3, 1)
    for off in range(0, 40):
        a = base + datetime.timedelta(days=off)
        for span in range(0, 25):
            b = a + datetime.timedelta(days=span)
            assert g(b) - g(a) == brute(a, b), (a, b)


def test_keyset_pagination_pushes_cursor_filter(spark, sf_dir):
    df = SPECS["scan_keyset_pagination"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    # The date half of the cursor must reach the parquet scan.
    assert "PushedFilters" in plan and "o_orderdate" in plan.split(
        "PushedFilters"
    )[1][:400], "cursor predicate must push down to the scan"
    rows = df.collect()
    assert len(rows) == 100
    keys = [(r["o_orderdate"], r["o_orderkey"]) for r in rows]
    assert keys == sorted(keys)
    assert all(d >= "1996-06-01" for d, _ in keys)


def test_key_skew_gini_bounds(spark, sf_dir):
    r = SPECS["dq_key_skew"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["hot_key_ratio"] >= 1.0
    assert r["max_cnt"] * r["n_keys"] >= r["n_rows"], "max*k >= total"


def test_bitemporal_correction_visibility(spark, sf_dir):
    """A correction recorded within the tx cutoff must be visible
    (version 2); one recorded after must not (version 1) — checked by
    comparing against raw order dates."""
    import datetime

    rows = {r["o_orderkey"]: r for r in
            SPECS["scd2_bitemporal"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    ).collect()
    cutoff = datetime.date(1998, 1, 1)
    for r in o:
        k = r["o_orderkey"]
        if r["d"] > cutoff:
            assert k not in rows  # not valid yet
            continue
        assert k in rows
        if k % 10 == 0 and r["d"] + datetime.timedelta(days=30) <= cutoff:
            assert rows[k]["tx_version"] == 2, k
        else:
            assert rows[k]["tx_version"] == 1, k


def test_trajectory_path_exceeds_straight_line(spark, sf_dir):
    rows = SPECS["geo_trajectory_stats"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # one per label
    for r in rows:
        assert r["path_micro_km"] > 0
        assert r["min_lat"] <= r["max_lat"] and r["min_lon"] <= r["max_lon"]


def test_token_bucket_waste_consistency(spark, sf_dir):
    rows = SPECS["token_bucket_padding"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["bucket_cap"] % 128 == 0
        assert r["real_tokens"] + r["padding_tokens"] == r["n_docs"] * r["bucket_cap"]
        assert 0 <= r["waste_ratio"] < 1


def test_ks_statistic_in_unit_interval(spark, sf_dir):
    r = SPECS["stat_ks_two_sample"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r["ks_d"] <= 1
    assert r["d_num"] <= r["n1"] * r["n2"]
    # A vs R are identically-generated populations: D must sit under the
    # 5% critical band, not at rejection scale.
    assert r["ks_d"] < 2 * r["crit_05"]


def test_psi_terms_nonnegative_and_small_on_stationary_split(spark, sf_dir):
    rows = SPECS["stat_psi_drift"].fn(spark, sf_dir).collect()
    total = sum(r["psi_term_micro"] for r in rows)
    # Each (p2-p1)*ln(p2/p1) term is >= 0 by construction.
    assert all(r["psi_term_micro"] >= 0 for r in rows)
    assert total < 250_000 * 4, "synthetic split should not hit retrain scale"


def test_feature_store_one_row_per_customer_with_null_semantics(spark, sf_dir):
    df = SPECS["feature_store_customer"].fn(spark, sf_dir)
    n_cust = load_table(spark, sf_dir, "customer").count()
    rows = df.collect()
    assert len(rows) == n_cust
    for r in rows:
        if r["n_items"] == 0:
            assert r["return_rate"] is None and r["avg_disc_pct"] is None
        else:
            assert 0 <= r["return_rate"] <= 1
        assert r["n_returned"] <= r["n_items"]


def test_snm_distributed_equals_global_window_and_partitions(spark, sf_dir):
    """The distributed SNM must emit exactly the global-window pair set,
    and its windows must be partitioned (no single-partition sort)."""
    a = {(r["a_key"], r["b_key"]) for r in
         SPECS["link_sorted_neighborhood"].fn(spark, sf_dir).collect()}
    b = {(r["a_key"], r["b_key"]) for r in
         SPECS["link_snm_distributed"].fn(spark, sf_dir).collect()}
    assert a == b
    plan = _optimized_plan(SPECS["link_snm_distributed"].fn(spark, sf_dir))
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_gid" in m.group(1), (
            "every window in the distributed SNM must partition by _gid:\n"
            + m.group(0)
        )


def test_snm_underfilled_partitions_lose_no_pairs(spark, sf_dir):
    """Regression for the one-deep boundary-duplication gap: when range
    partitions hold FEWER than W rows (num_partitions near N/W), rows
    needing lookahead two partitions ahead must still find their pairs.
    The operator now greedily coalesces adjacent underfilled partitions
    before duplicating, so the pair set stays partition-invariant."""
    from etl_caic_spark.operators.snm import sorted_neighborhood_pairs

    n, w = 40, 5
    df = spark.range(n).select(
        (F.col("id") * 37 % 1000).alias("k"),
        F.format_string("r%03d", F.col("id")).alias("name"),
        (F.col("id") * 37 % 1000).cast("string").alias("sort_key"),
    ).withColumn("k", F.col("k").cast("int"))
    # brute force: global sort order, all pairs within W positions
    rows = sorted(
        df.collect(), key=lambda r: (r["sort_key"], r["k"])
    )
    expect = {
        (rows[i]["k"], rows[j]["k"])
        for i in range(len(rows))
        for j in range(i + 1, min(i + w + 1, len(rows)))
    }
    # num_partitions ~ N/W: average partition is barely W rows, sampled
    # boundaries guarantee several sub-W partitions
    for parts in (n // w, n // 2, n * 2):
        got = {
            (r["a_k"], r["b_k"])
            for r in sorted_neighborhood_pairs(
                df, ["k", "name"], "sort_key", w=w, num_partitions=parts
            ).collect()
        }
        assert got == expect, f"pair set diverged at num_partitions={parts}"


def test_reciprocity_bounded_by_degree(spark, sf_dir):
    for r in SPECS["graph_reciprocity"].fn(spark, sf_dir).collect():
        assert 0 <= r["n_reciprocal"] <= r["out_degree"]
        assert abs(r["reciprocity"] - r["n_reciprocal"] / r["out_degree"]) < 1e-6


def test_range_search_threshold_and_symmetry(spark, sf_dir):
    rows = SPECS["sim_range_search"].fn(spark, sf_dir).collect()
    pairs = {(r["query_id"], r["match_id"]): r["cos_micro"] for r in rows}
    for (q, m), c in pairs.items():
        assert 300000 <= c <= 1000001
        if m % 100 == 0:  # the match is itself a query: mirror must exist
            assert (m, q) in pairs
            assert abs(pairs[(m, q)] - c) <= 1  # rounding of a symmetric value


def test_linear_attribution_credits_sum_to_one(spark, sf_dir):
    import collections

    rows = SPECS["attrib_linear_multi_touch"].fn(spark, sf_dir).collect()
    per_purchase = collections.defaultdict(float)
    for r in rows:
        per_purchase[r["purchase_id"]] += r["credit"]
    for pid, total in per_purchase.items():
        assert abs(total - 1.0) < 1e-3, (pid, total)


def test_quantile_normalize_is_monotone_within_source(spark, sf_dir):
    import collections

    rows = SPECS["feat_quantile_normalize"].fn(spark, sf_dir).collect()
    by_source = collections.defaultdict(list)
    for r in rows:
        by_source[r["source"]].append((r["value"], r["norm_value"]))
    for source, vals in by_source.items():
        vals.sort()
        norms = [n for _, n in vals]
        assert norms == sorted(norms), f"{source}: mapping must be monotone"


def test_dbscan_core_degree_gate_and_canonical_ids(spark, sf_dir):
    rows = SPECS["geo_dbscan_core"].fn(spark, sf_dir).collect()
    assert rows, "fixture density must yield core points"
    ids = {r["vec_id"] for r in rows}
    for r in rows:
        assert r["n_neighbors"] >= 3
        assert r["cluster_id"] <= r["vec_id"]
        assert r["cluster_id"] in ids, "canonical id must itself be a core point"


def test_deseasonal_anomalies_all_exceed_cut(spark, sf_dir):
    rows = SPECS["ts_anomaly_deseasonal"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["robust_z"] > 3.5
