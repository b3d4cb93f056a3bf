"""Wave-22a behavioral tests: full python-reference replays of the
ExactSubstr removal and the Bradley-Terry strength table (both
integer-exact), and structural/optimality laws for the D4 prototype
prune. The oracle differential runs via tools/driver_sim.py as usual."""

from __future__ import annotations

import hashlib
import math

from etl_caic_spark.plans.wave22a import _BT_GRID, _D4_PCT, _XR_G
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _word_hash(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % 1_048_576
    return h


def test_exactsubstr_removal_matches_python_reference(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    # positional 8-grams, corpus occurrence counts
    grams: dict = {}
    positions: dict = {}
    for did, text in docs.items():
        words = text.split(" ")
        hi = max(len(words) - _XR_G, 0)
        positions[did] = []
        for i in range(hi + 1):
            gh = hashlib.md5(
                " ".join(words[i : i + _XR_G]).encode()
            ).hexdigest()
            positions[did].append((i, gh))
            grams[gh] = grams.get(gh, 0) + 1
    expected = {}
    for did, text in docs.items():
        words = text.split(" ")
        dup = [p for p, gh in positions[did] if grams[gh] >= 2]
        # merge intervals [p, p + G - 1]: a dup start q chains onto the
        # previous dup start p iff q <= p + G (overlap or abut)
        spans = []  # (a, b, last_start)
        for p in sorted(dup):
            if spans and p <= spans[-1][2] + _XR_G:
                spans[-1] = (spans[-1][0], p + _XR_G - 1, p)
            else:
                spans.append((p, p + _XR_G - 1, p))
        ivs = [(a, b) for a, b, _ in spans]
        covered = set()
        for a, b in ivs:
            covered.update(range(a, b + 1))
        kept = [p for p in range(len(words)) if p not in covered]
        n = len(words)
        n_removed = n - len(kept)
        expected[did] = (
            n,
            n_removed,
            len(ivs),
            (2 * n_removed * 1_000_000 + n) // (2 * n),
            " ".join(words[p] for p in kept),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_spans"],
            r["removed_micro"],
            r["clean_text"],
        )
        for r in SPECS["text_exactsubstr_removal"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the fixture must exercise both regimes: untouched docs pass
    # through byte-identical, and some docs actually lose spans
    assert any(v[1] == 0 and v[4] == docs[k] for k, v in got.items())
    assert any(v[1] > 0 for v in got.values())


def test_d4_prototype_prune_laws(spark, sf_dir):
    rows = SPECS["data_d4_prototype_prune"].fn(spark, sf_dir).collect()
    e = {
        r["vec_id"]: (r["embedding"], r["label"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # every nonzero-norm vector appears exactly once
    nz = {
        vid
        for vid, (vec, _) in e.items()
        if math.sqrt(sum(float(x) * float(x) for x in vec)) > 0
    }
    assert {r["vec_id"] for r in rows} == nz
    # python replay of the exact fixed-point centroids
    per_label: dict = {}
    for vec, lab in e.values():
        per_label.setdefault(lab, []).append(vec)
    cents = {}
    for lab, vecs in per_label.items():
        dims = len(vecs[0])
        c = [
            sum(math.floor(float(v[d]) * 1e6) for v in vecs)
            / (1e6 * len(vecs))
            for d in range(dims)
        ]
        cents[lab] = (c, math.sqrt(sum(x * x for x in c)))
    by_cl: dict = {}
    for r in rows:
        by_cl.setdefault(r["cluster_id"], []).append(r)
        # the reported cosine must match the python cosine to the
        # assigned centroid within 1 micro (round-mode slack only)
        vec, _ = e[r["vec_id"]]
        nrm = math.sqrt(sum(float(x) * float(x) for x in vec))
        c, cn = cents[r["cluster_id"]]
        cos = sum(float(a) * b for a, b in zip(vec, c)) / (nrm * cn)
        assert abs(cos * 1e6 - r["cos_micro"]) <= 1.5
        # ...and the assignment must be the arg-max over all centroids
        # (1e-6 tolerance for the rounded tie-break)
        for lab2, (c2, cn2) in cents.items():
            cos2 = sum(float(a) * b for a, b in zip(vec, c2)) / (nrm * cn2)
            assert cos2 <= cos + 1e-6
    for cl, members in by_cl.items():
        csz = members[0]["cluster_size"]
        assert len(members) == csz
        assert sorted(m["proto_rank"] for m in members) == list(
            range(1, csz + 1)
        )
        members.sort(key=lambda m: m["proto_rank"])
        for a, b in zip(members, members[1:]):
            assert (a["cos_micro"], -a["vec_id"]) >= (
                b["cos_micro"],
                -b["vec_id"],
            ) or a["cos_micro"] > b["cos_micro"] - 2
        prune_k = csz * _D4_PCT // 100
        assert sum(1 for m in members if not m["is_kept"]) == prune_k
        for m in members:
            assert m["is_kept"] == (m["proto_rank"] > prune_k)
    # the decile prune must actually fire somewhere
    assert any(not r["is_kept"] for r in rows)


def test_bt_strength_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    hist: dict = {}
    n_docs: dict = {}
    for r in docs:
        score = sum(
            _word_hash(w) % 2001 - 1000 for w in r["text"].split(" ") if w
        )
        b = math.floor(score / float(_BT_GRID))
        hist[(r["source"], b)] = hist.get((r["source"], b), 0) + 1
        n_docs[r["source"]] = n_docs.get(r["source"], 0) + 1
    sources = sorted(n_docs)
    wins2: dict = {}
    games: dict = {}
    for (s1, b1), c1 in hist.items():
        for (s2, b2), c2 in hist.items():
            if s1 == s2:
                continue
            k = (s1, s2)
            games[k] = games.get(k, 0) + c1 * c2
            if b1 > b2:
                wins2[k] = wins2.get(k, 0) + 2 * c1 * c2
            elif b1 == b2:
                wins2[k] = wins2.get(k, 0) + c1 * c2
    w2 = {s: sum(v for (a, _), v in wins2.items() if a == s) for s in sources}
    n = {s: sum(v for (a, _), v in games.items() if a == s) for s in sources}
    gm1 = {
        s: max((2 * w2[s] * 1_000_000 + n[s]) // (2 * n[s]), 1)
        for s in sources
    }
    dn = {
        s: sum(
            (2 * games[(s, t)] * 10**12 + (gm1[s] + gm1[t]))
            // (2 * (gm1[s] + gm1[t]))
            for t in sources
            if t != s
        )
        for s in sources
    }
    expected = {
        s: (
            n_docs[s],
            n[s],
            w2[s],
            gm1[s],
            (w2[s] * 10**12 + dn[s]) // (2 * dn[s]),
        )
        for s in sources
    }
    got = {
        r["source"]: (
            r["n_docs"],
            int(r["games"]),
            int(r["wins2"]),
            r["gamma1_micro"],
            r["gamma2_micro"],
        )
        for r in SPECS["eval_bt_strength"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # BT must actually rank: strengths are not all equal, and a source
    # that wins more per game than another must not rank below it
    gammas = [v[4] for v in got.values()]
    assert len(set(gammas)) > 1
    rates = {s: v[2] / v[1] for s, v in got.items()}
    top = max(rates, key=lambda s: rates[s])
    bot = min(rates, key=lambda s: rates[s])
    assert got[top][4] > got[bot][4]
