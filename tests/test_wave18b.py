"""Wave-18b behavioral tests: python-reference replays of the two
composites and the parity audit (the oracle differential runs via
tools/driver_sim.py as usual)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

from tests.test_wave18a import _learn_and_encode, _shingles

SPECS = all_specs()


def _learn_merges(rows):
    from collections import Counter

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
    return merges


def _encode_tokens(word, merges):
    sym = " " + "".join(c + " " for c in word)
    for l, r in merges:
        pat, rep = f" {l} {r} ", f" {l}{r} "
        sym = sym.replace(pat, rep).replace(pat, rep)
    return len(sym.strip().split(" "))


def test_tokenize_pack_shard_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    merges = _learn_merges(rows)
    doc_toks = {}
    for r in rows:
        toks = sum(
            _encode_tokens(w, merges) for w in r["text"].split(" ") if w
        )
        doc_toks[r["doc_id"]] = toks
    # rendezvous placement, seed tps-v1, zero-padded-shard tiebreak
    placed = defaultdict(list)
    for did, toks in doc_toks.items():
        best = max(
            range(8),
            key=lambda s: (
                hashlib.md5(f"tps-v1|{s}|{did}".encode()).hexdigest()
                + "|"
                + f"{s:02d}"
            ),
        )
        placed[best].append((did, toks))
    expected = {}
    for shard, docs in placed.items():
        docs.sort()
        cum = 0
        max_bin = 0
        for _, toks in docs:
            max_bin = max(max_bin, cum // 512)
            cum += toks
        n_tokens = sum(t for _, t in docs)
        n_bins = max_bin + 1
        cap = n_bins * 512
        fill = (2 * n_tokens * 1_000_000 + cap) // (2 * cap)
        expected[shard] = (len(docs), n_tokens, n_bins, fill)
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_bins"], r["fill_micro"])
        for r in SPECS["corpus_tokenize_pack_shard"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == 8  # every shard populated on the fixture


def test_contamination_report_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    ev = [r for r in rows if r["doc_id"] % 37 == 0]
    tr = [r for r in rows if r["doc_id"] % 37 != 0]
    # gate 1: exact substring
    exact = {}
    for e in ev:
        if e["n_chars"] >= 60:
            probe = e["text"][10:40]
            exact[e["doc_id"]] = sum(1 for t in tr if probe in t["text"])
    # gate 2: 13-gram
    tr13 = {t["doc_id"]: _shingles(t["text"].split(" "), 13) for t in tr}
    ngram = {}
    for e in ev:
        gs = _shingles(e["text"].split(" "), 13)
        ngram[e["doc_id"]] = sum(1 for did, tg in tr13.items() if gs & tg)
    # gate 3: df-capped 3-shingle >= 2 shared
    all3 = {r["doc_id"]: _shingles(r["text"].split(" "), 3) for r in rows}
    df = defaultdict(int)
    for gs in all3.values():
        for g in gs:
            df[g] += 1
    capped = {
        did: {g for g in gs if df[g] <= 20} for did, gs in all3.items()
    }
    shingle = {}
    for e in ev:
        egs = capped[e["doc_id"]]
        shingle[e["doc_id"]] = sum(
            1 for t in tr if len(egs & capped[t["doc_id"]]) >= 2
        )
    expected = {
        e["doc_id"]: (
            exact.get(e["doc_id"], 0),
            ngram[e["doc_id"]],
            shingle[e["doc_id"]],
        )
        for e in ev
    }
    got = {
        r["eval_doc"]: (r["n_exact_docs"], r["n_ngram_docs"], r["n_shingle_docs"])
        for r in SPECS["eval_contamination_report"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    flags = {
        r["eval_doc"]: r["flagged"]
        for r in SPECS["eval_contamination_report"].fn(spark, sf_dir).collect()
    }
    for did, (a, b, c) in expected.items():
        assert flags[did] == (a > 0 or b > 0 or c > 0)
    # every eval doc reports a row, clean or not
    assert set(got) == {e["doc_id"] for e in ev}


def test_tokenizer_parity_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source", "text")
        .collect()
    )
    by_slice = _learn_and_encode(rows)  # (lang, source) -> (n, before, after, merged)
    per_lang = defaultdict(lambda: [0, 0, 0])  # words, chars, tokens
    for (lang, _src), (n, before, after, _m) in by_slice.items():
        a = per_lang[lang]
        a[0] += n
        a[1] += before
        a[2] += after
    tw = sum(v[0] for v in per_lang.values())
    tt = sum(v[2] for v in per_lang.values())
    expected = {}
    for lang, (nw, nc, nt) in per_lang.items():
        expected[lang] = (
            nw,
            nt,
            (2 * nt * 1_000_000 + nw) // (2 * nw),
            (2 * nc * 1_000_000 + nt) // (2 * nt),
            (2 * nt * tw * 1_000_000 + nw * tt) // (2 * nw * tt),
        )
    got = {
        r["lang"]: (
            r["n_words"],
            r["n_tokens"],
            r["fertility_micro"],
            r["chars_per_token_micro"],
            r["parity_micro"],
        )
        for r in SPECS["text_tokenizer_parity"].fn(spark, sf_dir).collect()
    }
    assert got == expected
