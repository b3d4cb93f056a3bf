"""Independent differentials for the round-12 wave17c queries: pure-
Python third implementations from the raw fixture, plus structural
invariants (G within a few percent of chi-square on this table,
Bartlett correction shrinks the statistic, oversampling reaches at
least the majority count, datasheet identities)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from hashlib import md5

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _cents(x: float) -> int:
    return int(Decimal(str(x * 100)).quantize(Decimal(1), ROUND_HALF_UP))


def _half_up_micro(num: int, den: int) -> int:
    return (2 * num * 1000000 + den) // (2 * den)


def test_g_test_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    cell: Counter = Counter()
    for r in rows:
        cell[(r["o_orderstatus"], r["o_orderpriority"])] += 1
    ro: Counter = Counter()
    co: Counter = Counter()
    for (a, b), o in cell.items():
        ro[a] += o
        co[b] += o
    n = sum(cell.values())
    g_micro = sum(
        2 * o * int(round(round(math.log(o * n / (ro[a] * co[b])), 6) * 1e6))
        for (a, b), o in cell.items()
    )
    got = SPECS["stat_g_test"].fn(spark, sf_dir).collect()[0]
    assert (got["n_rows"], got["n_cols"], got["n"]) == (len(ro), len(co), n)
    assert got["g_micro"] == g_micro
    # structural: G tracks Pearson chi2 on the same table (same dof)
    chi2 = sum(
        (o - ro[a] * co[b] / n) ** 2 / (ro[a] * co[b] / n)
        for (a, b), o in cell.items()
    )
    assert abs(g_micro / 1e6 - chi2) < max(1.0, 0.2 * chi2)


def test_bartlett_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    mom = defaultdict(lambda: [0, 0, 0])  # n, s, ss (exact ints)
    for r in rows:
        c = _cents(r["o_totalprice"])
        m = mom[r["o_orderpriority"]]
        m[0] += 1
        m[1] += c
        m[2] += c * c
    k = len(mom)
    nt = sum(m[0] for m in mom.values())
    df = nt - k
    css = {
        g: float(m[2]) - float(m[1]) * float(m[1]) / m[0]
        for g, m in mom.items()
    }
    ssw = sum(css[g] for g in mom)
    raw = 0
    for g, m in mom.items():
        ln = math.log((css[g] / (m[0] - 1.0)) / (ssw / float(df)))
        raw += -(m[0] - 1) * int(round(round(ln, 6) * 1e6))
    inv_sum = sum(1.0 / (m[0] - 1) for m in mom.values())
    corr = 1.0 + (inv_sum - 1.0 / df) / (3.0 * (k - 1))
    got = SPECS["stat_bartlett"].fn(spark, sf_dir).collect()[0]
    assert (got["k"], got["nt"]) == (k, nt)
    # float-sum order across groups can move ssw by ulps; allow the
    # per-term 1-micro wobble times the (n-1) weights
    assert abs(got["bartlett_raw_micro"] - raw) <= nt
    assert abs(got["bartlett_micro"] - round(raw / corr)) <= nt
    # structural: the correction factor shrinks the statistic
    assert abs(got["bartlett_micro"]) <= abs(got["bartlett_raw_micro"])


def test_oversample_minority_matches_python_reference(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "text")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += len(r["text"].split(" "))
    mx = max(a[0] for a in agg.values())
    got = {
        r["lang"]: r
        for r in SPECS["data_oversample_minority"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, ntok) in agg.items():
        g = got[lang]
        rep = -(-mx // nd)
        assert (g["n_docs"], g["n_tokens"], g["rep_factor"]) == (
            nd, ntok, rep,
        )
        assert g["resampled_docs"] == rep * nd
        assert g["resampled_tokens"] == rep * ntok
        # structural: replication reaches at least the majority count,
        # and overshoots by less than one extra replica of the class
        assert mx <= g["resampled_docs"] < mx + nd


def test_corpus_datasheet_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    per = defaultdict(lambda: [0, set(), 0, None, None, set()])
    for r in docs:
        ws = [w for w in r["text"].split(" ") if w]
        p = per[r["source"]]
        p[0] += 1
        p[1].add(md5(r["text"].encode()).hexdigest())
        p[2] += len(ws)
        p[3] = len(ws) if p[3] is None else min(p[3], len(ws))
        p[4] = len(ws) if p[4] is None else max(p[4], len(ws))
        p[5].update(ws)
    got = {
        r["source"]: r
        for r in SPECS["corpus_datasheet"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for src, (nd, hs, ntok, mn, mx, vocab) in per.items():
        g = got[src]
        assert (g["n_docs"], g["n_unique_texts"]) == (nd, len(hs))
        assert g["dup_rate_micro"] == _half_up_micro(nd - len(hs), nd)
        assert (g["n_tokens"], g["min_tokens"], g["max_tokens"]) == (
            ntok, mn, mx,
        )
        assert g["mean_tokens"] == (2 * ntok + nd) // (2 * nd)
        assert g["n_vocab"] == len(vocab)
        assert g["ttr_micro"] == _half_up_micro(len(vocab), ntok)
        # identities: uniques <= docs, vocab <= tokens
        assert g["n_unique_texts"] <= g["n_docs"]
        assert g["n_vocab"] <= g["n_tokens"]
