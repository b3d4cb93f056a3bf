"""Round-8 wave C: RRF hybrid retrieval, HITS, corpus BLEU-2."""

from __future__ import annotations

import math

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_rrf_fusion_scores_and_ranks(spark, sf_dir):
    rows = SPECS["rag_rrf_fusion"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r["rrf_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # sem_rank always present; lex_rank may be null (doc had none of
        # the 10 query terms) and then contributes 0
        expect = round(1e6 / (60 + r["sem_rank"]))
        if r["lex_rank"] is not None:
            expect += round(1e6 / (60 + r["lex_rank"]))
        assert r["rrf_micro"] == expect, r
    # a doc ranked #1 on both legs would score 2*round(1e6/61); nothing
    # can exceed that
    assert scores[0] <= 2 * round(1e6 / 61)


def test_hits_normalization_invariants(spark, sf_dir):
    rows = SPECS["graph_hits"].fn(spark, sf_dir).collect()
    assert rows
    hubs = [r["hub_micro"] for r in rows]
    auths = [r["auth_micro"] for r in rows]
    # after the final renormalization the max of each score is exactly 1e6
    assert max(hubs) == 1000000
    assert max(auths) == 1000000
    assert all(0 <= h <= 1000000 for h in hubs)
    assert all(0 <= a <= 1000000 for a in auths)
    # one row per node in the edge set
    assert len({r["user_id"] for r in rows}) == len(rows)


def test_bleu_corpus_bounds(spark, sf_dir):
    row = SPECS["eval_bleu_corpus"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    # clipped counts can never exceed totals -> ln p_n <= 0
    assert 0 < r["clip1"] <= r["tot1"]
    assert 0 < r["clip2"] <= r["tot2"]
    assert r["bp_micro"] <= 0
    assert r["ln_bleu2_micro"] <= 0
    # ln_bleu2 = bp + (lnp1 + lnp2)/2 recomputed from the count columns
    lnp1 = round(round(math.log(r["clip1"]), 6) * 1e6) - round(
        round(math.log(r["tot1"]), 6) * 1e6
    )
    lnp2 = round(round(math.log(r["clip2"]), 6) * 1e6) - round(
        round(math.log(r["tot2"]), 6) * 1e6
    )
    # Spark's round() on DOUBLE is HALF_UP like the SQL oracle
    half = (lnp1 + lnp2) / 2.0
    assert r["ln_bleu2_micro"] == r["bp_micro"] + int(
        math.floor(half + 0.5) if half >= 0 else -math.floor(-half + 0.5)
    )
