"""Wave-19a behavioral tests: python-reference replays of the 50-gram
dedup report and the frozen linear quality scorer, plus structural laws
for the cross-modal recall audit and the reward-margin audit. The
oracle differential runs via tools/driver_sim.py as usual."""

from __future__ import annotations

import hashlib
from collections import Counter

from etl_caic_spark.plans.wave19a import _CM_K, _FT_BUCKETS, _FT_WSPAN, _G50_N
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _grams(words, k):
    if len(words) <= k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def test_gram50_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    per_doc = {
        r["doc_id"]: {
            hashlib.md5(g.encode()).hexdigest()
            for g in _grams(r["text"].split(" "), _G50_N)
        }
        for r in docs
    }
    df = Counter(h for gs in per_doc.values() for h in gs)
    expected = {}
    for did, gs in per_doc.items():
        dup = sum(1 for h in gs if df[h] >= 2)
        if dup:
            micro = (2 * dup * 1_000_000 + len(gs)) // (2 * len(gs))
            expected[did] = (len(gs), dup, micro)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_micro"])
        for r in SPECS["dedup_gram50_exact"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # fixture contains exact dupes -> short docs collide


def _word_weight(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % _FT_BUCKETS
    return h % _FT_WSPAN - 1000


def test_fasttext_linear_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        ws = [w for w in r["text"].split(" ") if w]
        tw = sum(_word_weight(w) for w in ws)
        expected[r["doc_id"]] = (len(ws), tw, tw >= 0)
    got = {
        r["doc_id"]: (r["n_words"], r["total_weight_milli"], r["passes"])
        for r in SPECS["quality_fasttext_linear"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the frozen weights must actually discriminate (both gate outcomes)
    outcomes = {v[2] for v in expected.values()}
    assert outcomes == {True, False}


def test_crossmodal_recall_laws(spark, sf_dir):
    rows = SPECS["eval_crossmodal_recall"].fn(spark, sf_dir).collect()
    assert rows
    n_img = (
        load_table(spark, sf_dir, "embeddings")
        .filter("vec_id % 2 = 1")
        .count()
    )
    for r in rows:
        assert r["query_id"] % 2 == 0
        assert r["true_id"] == r["query_id"] + 1
        assert 1 <= r["true_rank"] <= n_img
        assert r["hit"] == (r["true_rank"] <= _CM_K)


def test_reward_margin_consistent_with_dpo_pairs(spark, sf_dir):
    pairs = {
        (r["source"], r["lang"]): r
        for r in SPECS["data_dpo_pairs"].fn(spark, sf_dir).collect()
    }
    rows = SPECS["eval_reward_margin"].fn(spark, sf_dir).collect()
    assert len(rows) == len(pairs)  # one audited row per preference pair
    for r in rows:
        p = pairs[(r["source"], r["lang"])]
        assert r["chosen_doc_id"] == p["chosen_doc_id"]
        assert r["rejected_doc_id"] == p["rejected_doc_id"]
        assert r["margin_chars"] == p["margin_chars"]
        # cross-multiplied margin: num/den == mean_c - mean_r exactly
        num = (
            r["chosen_weight_milli"] * r["rejected_words"]
            - r["rejected_weight_milli"] * r["chosen_words"]
        )
        assert r["reward_margin_num"] == num
        assert r["reward_margin_den"] == r["chosen_words"] * r["rejected_words"]
        assert r["reward_margin_den"] > 0
        assert r["reward_agrees"] == (num >= 0)
    # the reward model must not be degenerate (both agreement outcomes)
    assert {r["reward_agrees"] for r in rows} == {True, False}
