"""Independent differentials for the round-12 wave16a queries: pure-
Python third implementations recompute each metric from the raw fixture
(a formula mistake shared by query + oracle cannot survive an
independent derivation), plus structural invariants (BFD never beats
the bin lower bound, PH alarms are a subset of days, heavy-hitter
shares sum to <= 1)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from etl_caic_spark.plans.wave16a import (
    _HH_PHI,
    _PACK_CAP,
    _PH_DELTA,
    _PH_LAMBDA,
    _REF_WORDS,
)
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _lev(a, b) -> int:
    """Plain O(nm) Levenshtein over any sequences."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ref_hyp_words(doc_id: int, text: str):
    """The md5 corruption channel, independently in Python."""
    ref = text.split(" ")[:_REF_WORDS]
    hyp = []
    for pos, w in enumerate(ref):
        h = hashlib.md5(f"{doc_id}:{pos}:{w}".encode()).hexdigest()
        b = h[0]
        if b == "0":
            continue  # delete
        hyp.append("sub" + h[1:3] if b == "1" else w)
        if b == "2":
            hyp.append(w)  # duplicate-insert
    return ref, hyp


def _half_up_micro(num: int, den: int) -> int:
    return (2 * num * 1000000 + den) // (2 * den)


def test_wer_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n_docs, ref_words, edits
    for r in docs:
        ref, hyp = _ref_hyp_words(r["doc_id"], r["text"])
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(ref)
        a[2] += _lev(ref, hyp)  # word-level directly — no encoding trick
    got = {
        r["source"]: r
        for r in SPECS["eval_wer_corpus"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for src, (n, rw, ed) in agg.items():
        g = got[src]
        assert (g["n_docs"], g["ref_words"], g["word_edits"]) == (n, rw, ed)
        assert g["wer_micro"] == _half_up_micro(ed, rw)


def test_cer_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        ref, hyp = _ref_hyp_words(r["doc_id"], r["text"])
        rt, ht = " ".join(ref), " ".join(hyp)
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(rt)
        a[2] += _lev(rt, ht)
    got = {
        r["source"]: r
        for r in SPECS["eval_cer_corpus"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for src, (n, rc, ed) in agg.items():
        g = got[src]
        assert (g["n_docs"], g["ref_chars"], g["char_edits"]) == (n, rc, ed)
        assert g["cer_micro"] == _half_up_micro(ed, rc)


def test_pack_bestfit_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    groups = defaultdict(list)
    for r in docs:
        groups[r["source"]].append(
            (len(r["text"].split(" ")), r["doc_id"])
        )
    got = {
        r["source"]: r
        for r in SPECS["data_pack_bestfit"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for src, items in groups.items():
        items.sort(key=lambda p: (-p[0], p[1]))
        bins = []
        for tok, _ in items:
            fitting = [(r, i) for i, r in enumerate(bins) if r >= tok]
            if fitting:
                _, i = min(fitting)
                bins[i] -= tok
            else:
                bins.append(_PACK_CAP - tok)
        total = sum(t for t, _ in items)
        g = got[src]
        assert g["n_items"] == len(items)
        assert g["tokens_total"] == total
        assert g["n_bins"] == len(bins)
        assert g["lb_bins"] == -(-total // _PACK_CAP)
        # structural: BFD can never beat the volume lower bound
        assert g["n_bins"] >= g["lb_bins"]
        assert g["waste_tokens"] == len(bins) * _PACK_CAP - total
        assert g["efficiency_micro"] == _half_up_micro(
            total, len(bins) * _PACK_CAP
        )


def _daily_x(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(lambda: [0, 0])
    for r in rows:
        cents = int(
            Decimal(str(r["o_totalprice"] * 100)).quantize(
                Decimal(1), ROUND_HALF_UP
            )
        )
        d = daily[r["o_orderdate"].date()]
        d[0] += cents
        d[1] += 1
    return [
        (day, daily[day][0] // daily[day][1]) for day in sorted(daily)
    ]


def test_page_hinkley_matches_python_reference(spark, sf_dir):
    series = _daily_x(spark, sf_dir)
    sx = mt = 0
    min_m = None
    alarms = []
    max_ph = None
    for t, (day, x) in enumerate(series, 1):
        sx += x
        mt += x - sx // t - _PH_DELTA
        min_m = mt if min_m is None else min(min_m, mt)
        ph = mt - min_m
        max_ph = ph if max_ph is None else max(max_ph, ph)
        if ph > _PH_LAMBDA:
            alarms.append(day)
    g = SPECS["stat_page_hinkley"].fn(spark, sf_dir).collect()[0]
    assert g["n_days"] == len(series)
    assert g["n_alarms"] == len(alarms)
    assert g["first_alarm_day"] == (min(alarms) if alarms else None)
    assert g["max_ph_cents"] == max_ph
    assert 0 < g["n_alarms"] < g["n_days"], "calibration went degenerate"


def test_mann_kendall_matches_python_reference(spark, sf_dir):
    series = [x for _, x in _daily_x(spark, sf_dir)]
    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_term = sum(
        c * (c - 1) * (2 * c + 5)
        for c in Counter(series).values()
        if c > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    g = SPECS["stat_mann_kendall"].fn(spark, sf_dir).collect()[0]
    assert g["n_days"] == n
    assert g["s_stat"] == s
    assert g["var18"] == var18
    sgn = (s > 0) - (s < 0)
    want_z = round((s - sgn) * 1000000.0 / (var18 / 18.0) ** 0.5)
    assert abs(g["z_micro"] - want_z) <= 1  # one ulp of rounding slack


def test_heavy_hitters_match_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(t for t in r["text"].split(" ") if t)
    total = sum(cnt.values())
    want = {t: c for t, c in cnt.items() if c * _HH_PHI > total}
    got = {
        r["tok"]: r
        for r in SPECS["agg_heavy_hitters_exact"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    share_sum = 0
    for tok, c in want.items():
        g = got[tok]
        assert g["cnt"] == c
        assert g["total"] == total
        assert g["share_micro"] == _half_up_micro(c, total)
        share_sum += g["share_micro"]
    assert share_sum <= 1000000 + len(want)  # shares can't exceed 1
