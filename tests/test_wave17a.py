"""Independent differentials for the round-12 wave17a queries: pure-
Python third implementations recompute each metric from the raw fixture
(a formula mistake shared by query + oracle cannot survive an
independent derivation), plus structural invariants (F1 between P and
R, runs count bounds, SAX quartiles balanced, DP utility never better
than the exact median's)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from etl_caic_spark.plans.wave17a import _DPQ_BIN, _SAX_W, _SPAN_WORDS
from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _half_up_micro(num: int, den: int) -> int:
    return (2 * num * 1000000 + den) // (2 * den)


def _spans(labels):
    """Maximal runs of 1s -> set of (start, end) position pairs."""
    out, start = set(), None
    for pos, lab in labels:
        if lab and start is None:
            start, prev = pos, pos
        elif lab and pos == prev + 1:
            prev = pos
        elif lab:
            out.add((start, prev))
            start, prev = pos, pos
        elif start is not None:
            out.add((start, prev))
            start = None
    if start is not None:
        out.add((start, prev))
    return out


def test_span_f1_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n_gold, n_pred, n_match
    for r in docs:
        ws = r["text"].split(" ")[:_SPAN_WORDS]
        gold_l, pred_l = [], []
        for pos, w in enumerate(ws):
            g = int(w[:1] in "aeiou")
            h = hashlib.md5(
                f"spanflip|{r['doc_id']}:{pos}:{w}".encode()
            ).hexdigest()
            p = 1 - g if h[0] == "0" else g
            gold_l.append((pos, g))
            pred_l.append((pos, p))
        gs, ps = _spans(gold_l), _spans(pred_l)
        a = agg[r["source"]]
        a[0] += len(gs)
        a[1] += len(ps)
        a[2] += len(gs & ps)
    got = {
        r["source"]: r
        for r in SPECS["eval_span_f1"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for src, (ng, np_, nm) in agg.items():
        g = got[src]
        assert (g["n_gold"], g["n_pred"], g["n_match"]) == (ng, np_, nm)
        assert g["p_micro"] == (_half_up_micro(nm, np_) if np_ else 0)
        assert g["r_micro"] == (_half_up_micro(nm, ng) if ng else 0)
        assert g["f1_micro"] == _half_up_micro(2 * nm, ng + np_)
        # structural: F1 is between min(P,R) and max(P,R) (harmonic mean)
        assert (
            min(g["p_micro"], g["r_micro"]) - 1
            <= g["f1_micro"]
            <= max(g["p_micro"], g["r_micro"]) + 1
        )


def test_distinct_ngrams_match_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    uni = defaultdict(lambda: [0, set()])
    bi = defaultdict(lambda: [0, set()])
    for r in docs:
        ws = [w for w in r["text"].split(" ") if w]
        u, b = uni[r["source"]], bi[r["source"]]
        u[0] += len(ws)
        u[1].update(ws)
        pairs = [f"{x} {y}" for x, y in zip(ws, ws[1:])]
        b[0] += len(pairs)
        b[1].update(pairs)
    got = {
        r["source"]: r
        for r in SPECS["eval_distinct_ngrams"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(uni)
    for src in uni:
        g = got[src]
        nu, du = uni[src][0], len(uni[src][1])
        nb, db = bi[src][0], len(bi[src][1])
        assert (g["n_unigrams"], g["d_unigrams"]) == (nu, du)
        assert (g["n_bigrams"], g["d_bigrams"]) == (nb, db)
        assert g["distinct1_micro"] == _half_up_micro(du, nu)
        assert g["distinct2_micro"] == _half_up_micro(db, nb)
        # fixture-calibration check (r12 ADVICE): bigram > unigram
        # diversity holds on the default word-soup fixture, not on any
        # corpus — guard behind the default fixture path.
        if sf_dir == "/root/testdata/sf0.01":
            assert g["distinct2_micro"] >= g["distinct1_micro"]


def test_mcnemar_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .collect()
    )
    n = len(rows)
    bc = ao = bo = bw = 0
    for r in rows:
        truth = r["o_orderstatus"] == "F"
        pa = hashlib.md5(f"mcn-A|{r['o_orderkey']}".encode()).hexdigest()[0] < "8"
        pb = hashlib.md5(f"mcn-B|{r['o_orderkey']}".encode()).hexdigest()[0] < "6"
        ca, cb = pa == truth, pb == truth
        bc += ca and cb
        ao += ca and not cb
        bo += cb and not ca
        bw += not ca and not cb
    g = SPECS["stat_mcnemar"].fn(spark, sf_dir).collect()[0]
    assert (g["n"], g["both_correct"], g["a_only"], g["b_only"],
            g["both_wrong"]) == (n, bc, ao, bo, bw)
    assert bc + ao + bo + bw == n
    d = abs(ao - bo) - 1
    assert g["chi2_micro"] == (
        _half_up_micro(d * d, ao + bo) if ao + bo else 0
    )
    assert ao + bo > 0, "calibration went degenerate (no discordant pairs)"


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
    return [(day, daily[day][0] // daily[day][1]) for day in sorted(daily)]


def test_runs_test_matches_python_reference(spark, sf_dir):
    series = _daily_x(spark, sf_dir)
    ordered = sorted((x, day) for day, x in series)
    med = ordered[(len(ordered) + 1) // 2 - 1][0]
    signs = [int(x > med) for _, x in series if x != med]
    n_keep, a = len(signs), sum(signs)
    b = n_keep - a
    runs = 1 + sum(s != p for s, p in zip(signs[1:], signs))
    g = SPECS["stat_runs_test"].fn(spark, sf_dir).collect()[0]
    assert (g["n_keep"], g["n_above"], g["n_below"], g["n_runs"]) == (
        n_keep, a, b, runs,
    )
    assert 1 <= runs <= n_keep
    num = runs * n_keep - n_keep - 2 * a * b
    sig = math.sqrt(2.0 * a * b * (2 * a * b - n_keep) / (n_keep - 1.0))
    assert abs(g["z_micro"] - round(num * 1000000.0 / sig)) <= 1


def test_sax_symbolize_matches_python_reference(spark, sf_dir):
    series = _daily_x(spark, sf_dir)
    segs = defaultdict(lambda: [None, 0, 0])  # start_day, sum, n
    for t, (day, x) in enumerate(series, 1):
        s = segs[(t - 1) // _SAX_W]
        s[0] = day if s[0] is None else min(s[0], day)
        s[1] += x
        s[2] += 1
    means = {k: (v[0], v[1] // v[2], v[2]) for k, v in segs.items()}
    order = sorted(means, key=lambda k: (means[k][1], k))
    n = len(order)
    # standard SQL ntile: first n % 4 buckets get one extra row
    q, r = divmod(n, 4)
    sym = {}
    i = 0
    for b in range(4):
        size = q + (1 if b < r else 0)
        for k in order[i:i + size]:
            sym[k] = chr(97 + b)
        i += size
    got = {
        r["seg"]: r
        for r in SPECS["ts_sax_symbolize"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(means)
    for k, (start, mean, ndays) in means.items():
        g = got[k]
        assert (g["start_day"], g["mean_cents"], g["n_days"]) == (
            start, mean, ndays,
        )
        assert g["symbol"] == sym[k]
    # structural: quartile sizes differ by at most one
    from collections import Counter

    sizes = Counter(r["symbol"] for r in got.values())
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_dp_quantile_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    groups = defaultdict(lambda: defaultdict(int))
    for r in rows:
        cents = int(
            Decimal(str(r["o_totalprice"] * 100)).quantize(
                Decimal(1), ROUND_HALF_UP
            )
        )
        groups[r["o_orderpriority"]][cents // _DPQ_BIN] += 1
    got = {
        r["grp"]: r
        for r in SPECS["priv_dp_quantile"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for grp, bins in groups.items():
        n = sum(bins.values())
        best_score, best_bin, best_u = None, None, None
        exact_bin, cum = None, 0
        for b in sorted(bins):
            cnt_lt = cum
            cnt = bins[b]
            cum += cnt
            if exact_bin is None and 2 * cum >= n + 1:
                exact_bin = b
            u = -abs(2 * cnt_lt + cnt - n)
            h = hashlib.md5(f"dpq-seed-v1|{grp}|{b}".encode()).hexdigest()
            unif = (int(h[:8], 16) + 0.5) / 4294967296.0
            gum = round(-math.log(-math.log(unif)) * 1000000)
            score = u * 500000 + gum
            if best_score is None or score > best_score or (
                score == best_score and b < best_bin
            ):
                best_score, best_bin, best_u = score, b, u
        g = got[grp]
        assert g["n"] == n
        assert g["dp_bin"] == best_bin
        assert g["dp_utility"] == best_u
        assert g["exact_bin"] == exact_bin
        # structural: utility is never positive; the exact median has
        # maximal (least negative) achievable rank utility
        assert best_u <= 0
