"""Wave-21a behavioral tests: python-reference replay of the RHO
selection, cross-checks of the quality gate against its three component
queries, and planted-truth laws for the semantic-dedup agreement table.
The oracle differential runs via tools/driver_sim.py as usual."""

from __future__ import annotations

from etl_caic_spark.plans.wave21a import _RHO_K
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _word_hash(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % 1_048_576
    return h


def test_rho_selection_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    scored = []
    for r in docs:
        hs = [_word_hash(w) for w in r["text"].split(" ") if w]
        a = sum(g % 2001 - 1000 for g in hs)
        b = sum((g * 13 + 7) % 2001 - 1000 for g in hs)
        scored.append((r["source"], r["doc_id"], len(hs), a, b, b - a))
    expected = {}
    by_src: dict = {}
    for row in scored:
        by_src.setdefault(row[0], []).append(row)
    for src, rows in by_src.items():
        rows.sort(key=lambda t: (-t[5], t[1]))
        for rnk, t in enumerate(rows[:_RHO_K], 1):
            expected[t[1]] = (src, t[2], t[3], t[4], t[5], rnk)
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_words"],
            r["score_train"],
            r["score_ref"],
            r["rho_milli"],
            r["rnk"],
        )
        for r in SPECS["data_rho_selection"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the two frozen tables must disagree enough that selection is real
    assert len(got) < len(docs)


def test_quality_gate_consistent_with_components(spark, sf_dir):
    gate = {
        r["doc_id"]: r
        for r in SPECS["quality_ensemble_gate"].fn(spark, sf_dir).collect()
    }
    ft = {
        r["doc_id"]: r["passes"]
        for r in SPECS["quality_fasttext_linear"].fn(spark, sf_dir).collect()
    }
    lid = {
        r["doc_id"]: r["predicted_lang"] == r["declared_lang"]
        for r in SPECS["text_langid_chargram"].fn(spark, sf_dir).collect()
    }
    assert set(gate) == set(ft) == set(lid)
    for did, r in gate.items():
        assert r["fasttext_pass"] == ft[did]
        assert r["langid_agrees"] == lid[did]
        assert r["n_pass"] == sum(
            [r["gopher_pass"], r["fasttext_pass"], r["langid_agrees"]]
        )
        assert r["keep"] == (r["n_pass"] >= 2)
    # the gopher per-source fail counts must reconcile with the rollup
    rollup = {
        r["source"]: r["n_pass"]
        for r in SPECS["quality_gopher_rules"].fn(spark, sf_dir).collect()
    }
    per_src: dict = {}
    for r in gate.values():
        per_src[r["source"]] = per_src.get(r["source"], 0) + int(
            r["gopher_pass"]
        )
    assert per_src == rollup
    # the gate must actually discriminate
    keeps = {r["keep"] for r in gate.values()}
    assert keeps == {True, False}


def test_semdedup_agreement_laws(spark, sf_dir):
    rows = SPECS["eval_semdedup_agreement"].fn(spark, sf_dir).collect()
    cells = {
        (r["is_twin"], r["kept_lsh"], r["kept_ivf"]): r["n"] for r in rows
    }
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    n_twins = (
        load_table(spark, sf_dir, "embeddings").filter("vec_id % 10 = 0").count()
    )
    assert sum(cells.values()) == n_vecs + n_twins
    assert sum(n for (t, _, _), n in cells.items() if t) == n_twins
    # each method prunes a real share of the planted twins (measured at
    # sf0.01: IVF 42/50 — misses only cross-cluster quantizer splits;
    # SRP-LSH 23/50 — a one-dim flip disturbs several hyperplane bits,
    # so banding misses more; THE audit finding this table exists for)
    lsh_pruned = sum(n for (t, kl, _), n in cells.items() if t and not kl)
    ivf_pruned = sum(n for (t, _, ki), n in cells.items() if t and not ki)
    assert lsh_pruned >= n_twins * 0.3
    assert ivf_pruned >= n_twins * 0.7
    # ...and essentially never prune originals (the LSH side is exact-
    # verified >= 0.9; the IVF side can only pair within a cluster)
    orig_pruned = sum(
        n for (t, kl, ki), n in cells.items() if not t and (not kl or not ki)
    )
    assert orig_pruned <= n_vecs * 0.02
    # the methods must DISAGREE somewhere (the audit's reason to exist:
    # quantizer-boundary misses differ from banding misses)
    assert any(kl != ki for (t, kl, ki), n in cells.items() if t and n > 0)
