"""Round-8 wave H: minhash quality audit, hysteresis alerts, token
budget packing."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_minhash_quality_counts_consistent(spark, sf_dir):
    row = SPECS["eval_minhash_quality"].fn(spark, sf_dir).collect()[0]
    # tp can't exceed either side
    assert 0 <= row["n_tp"] <= min(row["n_truth"], row["n_cand"])
    assert 0 <= row["precision_micro"] <= 1000000
    assert 0 <= row["recall_micro"] <= 1000000
    # the fixture corpus contains planted near-dups: truth is non-empty
    # and the md5 LSH should recover a healthy fraction
    assert row["n_truth"] > 0
    assert row["recall_micro"] >= 500000, row


def test_hysteresis_state_machine_python_replay(spark, sf_dir):
    import pyspark.sql.functions as F

    from etl_caic_spark.sources import load_table

    got = {r["user_id"]: r for r in
           SPECS["ts_hysteresis_alerts"].fn(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    saw_disarmed_after_episode = False
    for uid in sorted(by_user):
        state = "off"
        rows_on = episodes = 0
        for _, _, v in sorted(by_user[uid]):
            prev = state
            if v >= 400.0:
                state = "on"
            elif v <= 50.0:
                state = "off"
            if state == "on":
                rows_on += 1
                if prev == "off":
                    episodes += 1
        r = got[uid]
        assert (r["rows_in_alert"], r["n_episodes"]) == (rows_on, episodes), uid
        # currently_on is the held state at the LATEST event, not "ever on"
        assert r["currently_on"] == (state == "on"), uid
        if episodes > 0 and state == "off":
            saw_disarmed_after_episode = True
    # the fixture must actually exercise the ever-on != currently-on case
    assert saw_disarmed_after_episode


def test_token_budget_prefix_properties(spark, sf_dir):
    rows = SPECS["data_token_budget_pack"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        # greedy prefix: every source keeps at least one doc
        assert 1 <= r["n_docs_kept"] <= r["n_docs_total"]
        assert 0 < r["tokens_kept"] <= r["tokens_total"]
        # the kept set stops as soon as the budget is crossed: removing
        # its last doc must leave the running total under budget, so
        # tokens_kept minus ANY single doc's tokens < 1000 is implied by
        # cum_before < 1000 of the last kept doc; weak-form check:
        if r["n_docs_kept"] < r["n_docs_total"]:
            assert r["tokens_kept"] >= 1000


def test_lsh_builder_shapes_pair_identical(spark, sf_dir):
    """The two plan shapes of minhash_md5_candidate_pairs (production
    checkpoint-sig vs single-job sig-carry) must produce the SAME pair
    set — the r12 ADVICE desynchronization guard, now asserted directly
    on top of the shared-code refactor."""
    from etl_caic_spark.operators import dedup as D
    from etl_caic_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    kw = dict(num_hashes=16, bands=8, k=3, threshold=0.5)
    prod = D.minhash_md5_candidate_pairs(
        d, "doc_id", "text", checkpoint_sig=True, **kw
    )
    audit = D.minhash_md5_candidate_pairs(
        d, "doc_id", "text", checkpoint_sig=False, **kw
    )
    p = {(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in prod.collect()}
    a = {(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in audit.collect()}
    assert p == a
    assert p  # fixture has planted near-dups: non-vacuous
