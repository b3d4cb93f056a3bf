"""Property-style checks for operators with weak/no SQL oracles
(SURVEY.md §5.2.4): approx distinct error bounds, MinHash estimate vs exact
Jaccard, SimHash banding completeness, IVF recall vs brute force, and
url_encode vs Python's quoting."""

from __future__ import annotations

import urllib.parse

from pyspark.sql import functions as F

from etl_caic_spark.operators import dedup as D
from etl_caic_spark.operators import similarity as S
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_approx_distinct_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in SPECS["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    for k, exact_n in exact.items():
        rel_err = abs(approx[k] - exact_n) / exact_n
        assert rel_err < 0.1, f"{k}: approx {approx[k]} vs exact {exact_n}"


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """Every LSH-surfaced pair's signature estimate must be within ±0.35 of
    the exact shingle Jaccard (32 hashes → σ ≈ 0.09; 0.35 ≈ 4σ), and pairs
    with exact Jaccard ≥ 0.8 must be recalled by the banding."""
    d = load_table(spark, sf_dir, "documents")
    est_pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in SPECS["dedup_minhash"].fn(spark, sf_dir).collect()
    }
    assert est_pairs, "LSH produced no candidate pairs on the near-dup corpus"

    exact = D.ngram_jaccard_pairs(
        d, "doc_id", "text", bucket_cols=[], k=3, threshold=0.0
    )
    exact_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact.filter(F.col("jaccard") >= 0.4).collect()
    }
    for pair, est in est_pairs.items():
        ex = exact_pairs.get(pair, 0.0)
        assert abs(est - ex) <= 0.35, f"{pair}: est {est} vs exact {ex}"
    high = {p for p, j in exact_pairs.items() if j >= 0.8}
    missed = high - set(est_pairs)
    assert len(missed) <= max(1, len(high) // 10), f"missed high-J pairs: {missed}"


def test_simhash_banding_is_complete(spark, sf_dir):
    """The 4-block pigeonhole join must find exactly the brute-force pair
    set with hamming <= 3 (banding is complete for hamming <= blocks-1)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_pairs(d, "doc_id", "text", max_hamming=3).collect()
    }
    fp = D.simhash_fingerprints(d, "doc_id", "text")
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=2 of ~10 labels should recall a reasonable fraction
    of the true top-5 (the corpus has no cluster structure, so the bound is
    loose — this guards the plumbing, not ANN quality)."""
    brute = SPECS["sim_topk_cosine"].fn(spark, sf_dir).collect()
    ivf = SPECS["sim_topk_ivf"].fn(spark, sf_dir).collect()
    brute_set = {(r["query_id"], r["vec_id"]) for r in brute}
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf}
    assert ivf_set, "IVF returned nothing"
    # every IVF hit must be a real corpus vector scored identically
    ivf_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in ivf}
    brute_all = {(r["query_id"], r["vec_id"]): r["cosine"] for r in brute}
    for k in ivf_set & brute_set:
        assert ivf_cos[k] == brute_all[k]
    recall = len(ivf_set & brute_set) / len(brute_set)
    assert recall >= 0.2, f"IVF recall {recall:.2f} too low"


def test_ivf_kmeans_recall(spark, sf_dir):
    """Trained-quantizer IVF should reach reasonable recall of the true
    top-5 with nprobe=2 of 8 cells; scored hits must match brute cosine."""
    brute = {(r["query_id"], r["vec_id"]): r["cosine"]
             for r in SPECS["sim_topk_cosine"].fn(spark, sf_dir).collect()}
    ivf = {(r["query_id"], r["vec_id"]): r["cosine"]
           for r in SPECS["sim_topk_ivf_kmeans"].fn(spark, sf_dir).collect()}
    assert ivf
    for key in set(ivf) & set(brute):
        assert ivf[key] == brute[key]
    recall = len(set(ivf) & set(brute)) / len(brute)
    assert recall >= 0.2, f"IVF-kmeans recall {recall:.2f}"


def test_urlencode_matches_python(spark, sf_dir):
    rows = SPECS["fn_urlencode"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expected = urllib.parse.quote_plus(r["raw"])
        assert r["encoded"] == expected, (r["raw"], r["encoded"], expected)


def test_keep_first_after_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", ["lang", "source"], k=3, threshold=0.5
    )
    kept = D.keep_first_after_pairs(d, pairs, "doc_id")
    dropped = {r["doc_b"] for r in pairs.select("doc_b").distinct().collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids.isdisjoint(dropped)
    total = d.count()
    assert len(kept_ids) == total - len(dropped)


def test_pack_sequences_invariants(spark, sf_dir):
    rows = SPECS["text_pack_sequences"].fn(spark, sf_dir).collect()
    assert all(0 <= r["offset_in_bin"] < 2048 for r in rows)
    # per shard, bins start at 0 and are non-decreasing in doc order
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for bins in by_shard.values():
        assert bins[0] == 0
        assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))


def test_chunks_cover_all_tokens(spark, sf_dir):
    from etl_caic_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    lens = {r["doc_id"]: len(r["text"].split(" ")) for r in d.collect()}
    from etl_caic_spark.operators.text_analysis import chunk_documents

    chunks = chunk_documents(d, "doc_id", "text", window=40, stride=30).collect()
    for doc_id, n in lens.items():
        mine = sorted(
            (r["chunk_idx"], r["chunk_tokens"]) for r in chunks if r["doc_id"] == doc_id
        )
        # last chunk reaches the final token; consecutive chunks overlap by 10
        last_idx, last_tokens = mine[-1]
        assert last_idx * 30 + last_tokens == n
        assert all(i == idx for i, (idx, _) in enumerate(mine))
