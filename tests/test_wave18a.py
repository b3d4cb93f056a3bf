"""Wave-18a behavioral tests: python-reference replays (decontamination,
BPE encode, quantized recall) and the LSH sweep's nesting/monotonicity
laws. The oracle differential runs via tools/driver_sim.py as usual."""

from __future__ import annotations

from collections import Counter, defaultdict

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _shingles(words, k):
    if len(words) <= k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def test_decontaminate_matches_python_reference(spark, sf_dir):
    from etl_caic_spark.plans.wave18a import _DECON_EVAL_CAP

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    grams = {r["doc_id"]: _shingles(r["text"].split(" "), 13) for r in docs}
    ev = defaultdict(set)  # gram -> eval docs (frozen: mod AND absolute cap)
    for did, gs in grams.items():
        if did % 37 == 0 and did < _DECON_EVAL_CAP:
            for g in gs:
                ev[g].add(did)
    expected = {}
    for did, gs in grams.items():
        if did % 37 == 0 and did < _DECON_EVAL_CAP:
            continue
        hit = {g for g in gs if g in ev}
        if hit:
            eval_docs = set().union(*(ev[g] for g in hit))
            micro = (2 * len(hit) * 1_000_000 + len(gs)) // (2 * len(gs))
            expected[did] = (len(gs), len(hit), len(eval_docs), micro)
    got = {
        r["doc_id"]: (
            r["n_ngrams"],
            r["n_hit_ngrams"],
            r["n_eval_docs"],
            r["contamination_micro"],
        )
        for r in SPECS["text_decontaminate_ngrams"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # fixture contains planted near-dups crossing the split


def test_lsh_sweep_nesting_laws(spark, sf_dir):
    rows = {
        r["bands"]: r
        for r in SPECS["eval_lsh_threshold_sweep"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {16, 8, 4}
    # one shared truth set
    truths = {r["n_truth"] for r in rows.values()}
    assert len(truths) == 1
    for b, r in rows.items():
        assert r["rows_per_band"] == 16 // b
        assert r["n_tp"] <= min(r["n_cand"], r["n_truth"])
    # bucket nesting: a match on a wider band implies matches on its
    # sub-bands, so candidate (and tp) sets shrink as bands shrink
    assert rows[16]["n_cand"] >= rows[8]["n_cand"] >= rows[4]["n_cand"]
    assert rows[16]["n_tp"] >= rows[8]["n_tp"] >= rows[4]["n_tp"]
    assert rows[16]["recall_micro"] >= rows[8]["recall_micro"] >= rows[4]["recall_micro"]


def _learn_and_encode(rows):
    """Frozen-semantics BPE reference: learn 3 merges on the top-200
    vocab, then encode every word with the same double non-overlapping
    replace both engines use."""
    wf = Counter()
    for r in rows:
        for w in r["text"].split(" "):
            if w:
                wf[w] += 1
    vocab = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    syms = {w: " " + "".join(c + " " for c in w) for w, _ in vocab}
    merges = []
    for _ in range(3):
        pairs = Counter()
        for w, f in vocab:
            ws = syms[w].strip().split(" ")
            for i in range(len(ws) - 1):
                pairs[(ws[i], ws[i + 1])] += f
        if not pairs:
            break
        (l, r), _wt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((l, r))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        for w in syms:
            syms[w] = syms[w].replace(pat, rep).replace(pat, rep)
    agg = defaultdict(lambda: [0, 0, 0])  # n_words, syms_before, tokens_after
    for row in rows:
        for w in row["text"].split(" "):
            if not w:
                continue
            sym = " " + "".join(c + " " for c in w)
            for l, r in merges:
                pat, rep = f" {l} {r} ", f" {l}{r} "
                sym = sym.replace(pat, rep).replace(pat, rep)
            a = agg[(row["lang"], row["source"])]
            a[0] += 1
            a[1] += len(w)
            a[2] += len(sym.strip().split(" "))
    return {
        k: (v[0], v[1], v[2], v[1] - v[2]) for k, v in agg.items()
    }


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source", "text")
        .collect()
    )
    expected = _learn_and_encode(rows)
    got = {
        (r["lang"], r["source"]): (
            r["n_words"],
            r["syms_before"],
            r["tokens_after"],
            r["n_merged"],
        )
        for r in SPECS["text_bpe_encode"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # merges must actually compress something on the fixture
    assert any(v[3] > 0 for v in got.values())


def test_quantized_recall_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )

    def seqsum(it):
        acc = 0.0
        for x in it:
            acc += x
        return acc

    vecs = {}
    for r in rows:
        e = [float(x) for x in r["embedding"]]
        nrm = seqsum(x * x for x in e) ** 0.5
        if nrm <= 0:
            continue
        ue = [x / nrm for x in e]
        maxabs = max(abs(x) for x in ue)
        # round-half-away-from-zero, matching Spark/DuckDB round()
        qv = []
        for x in ue:
            v = x * 127.0 / maxabs
            qv.append(int(v + 0.5) if v >= 0 else -int(-v + 0.5))
        vecs[r["vec_id"]] = (ue, qv)
    expected = {}
    for qid, (que, qqv) in vecs.items():
        if qid % 25 != 0 or qid >= 500:
            continue
        exact, approx = [], []
        for cid, (cue, cqv) in vecs.items():
            if cid == qid:
                continue
            cos = round(seqsum(a * b for a, b in zip(que, cue)), 6)
            idot = sum(a * b for a, b in zip(qqv, cqv))
            exact.append((-cos, cid))
            approx.append((-idot, cid))
        top_e = {cid for _, cid in sorted(exact)[:10]}
        top_a = {cid for _, cid in sorted(approx)[:10]}
        common = len(top_e & top_a)
        expected[qid] = (common, common * 1_000_000 // 10)
    got = {
        r["query_id"]: (r["n_common"], r["recall_micro"])
        for r in SPECS["eval_quantized_recall"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # quantization is lossy but not useless on the fixture
    assert all(0 < c <= 10 for c, _ in got.values())
