"""Independent differentials for the round-11 wave15a queries: pure-
Python third implementations recompute each metric from the raw fixture
(a formula mistake shared by query + oracle cannot survive an
independent derivation), plus structural invariants (chosen != rejected
in every DPO pair, F1 between min and max of P/R, changepoint strictly
inside the series)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _cents(x: float) -> int:
    # Spark F.round is HALF_UP; Python round() is banker's — match Spark.
    return int(Decimal(str(x * 100)).quantize(Decimal(1), ROUND_HALF_UP))


def test_confusion_prf_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    conf: Counter = Counter()
    for r in rows:
        t = int(r["o_orderpriority"][0])
        p = _cents(r["o_totalprice"]) % 5 + 1
        conf[(t, p)] += 1
    classes = {t for t, _ in conf} | {p for _, p in conf}
    want = {}
    for c in classes:
        tp = conf.get((c, c), 0)
        fp = sum(n for (t, p), n in conf.items() if p == c and t != c)
        fn = sum(n for (t, p), n in conf.items() if t == c and p != c)
        want[c] = (
            tp,
            fp,
            fn,
            int(round(tp * 1e6 / (tp + fp))) if tp + fp else 0,
            int(round(tp * 1e6 / (tp + fn))) if tp + fn else 0,
            int(round(2 * tp * 1e6 / (2 * tp + fp + fn)))
            if 2 * tp + fp + fn
            else 0,
        )
    got = SPECS["eval_confusion_prf"].fn(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        tp, fp, fn, pm, rm, f1 = want[r["cls"]]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
        assert (r["precision_micro"], r["recall_micro"]) == (pm, rm)
        assert r["f1_micro"] == f1
        # F1 is the harmonic mean: between min and max of P and R
        # (allow 1 micro of rounding slack at each bound).
        assert min(pm, rm) - 1 <= f1 <= max(pm, rm) + 1


def test_perplexity_heldout_matches_python_reference(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    train_uni: Counter = Counter()
    train_bg: Counter = Counter()
    test_bigrams = []
    n_test_docs = 0
    for r in docs:
        toks = r["text"].split(" ")
        h = hashlib.md5(f"ppl-v1|{r['doc_id']}".encode()).hexdigest()
        if h[0] in ("0", "1"):
            if len(toks) >= 2:
                n_test_docs += 1
                test_bigrams += list(zip(toks, toks[1:]))
        else:
            train_uni.update(toks)
            train_bg.update(zip(toks, toks[1:]))
    vocab = len(train_uni)
    total = 0
    for w1, w2 in test_bigrams:
        ratio = (train_bg.get((w1, w2), 0) + 1.0) / (
            train_uni.get(w1, 0) + vocab
        )
        total += int(round(round(math.log(ratio), 6) * 1e6))
    got = SPECS["eval_perplexity_heldout"].fn(spark, sf_dir).collect()[0]
    assert got["n_test_docs"] == n_test_docs
    assert got["n_test_bigrams"] == len(test_bigrams)
    assert got["logprob_micro"] == total
    assert got["ppl_micronat_per_token"] == int(
        round(-total * 1.0 / len(test_bigrams))
    )
    # held-out logprob is strictly negative; micronats/token positive
    assert total < 0 < got["ppl_micronat_per_token"]


def test_dpo_pairs_matches_python_reference(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "lang", "doc_id", "n_chars")
        .collect()
    )
    groups: dict = defaultdict(list)
    for r in docs:
        groups[(r["source"], r["lang"])].append((r["n_chars"], r["doc_id"]))
    got = {
        (r["source"], r["lang"]): r
        for r in SPECS["data_dpo_pairs"].fn(spark, sf_dir).collect()
    }
    want_keys = {k for k, v in groups.items() if len(v) >= 2}
    assert set(got) == want_keys
    for k in want_keys:
        cand = groups[k]
        chosen = max(cand, key=lambda c: (c[0], -c[1]))
        rejected = min(cand, key=lambda c: (c[0], -c[1]))
        r = got[k]
        assert r["chosen_doc_id"] == chosen[1]
        assert r["rejected_doc_id"] == rejected[1]
        assert r["chosen_chars"] == max(c[0] for c in cand)
        assert r["rejected_chars"] == min(c[0] for c in cand)
        assert r["margin_chars"] == r["chosen_chars"] - r["rejected_chars"]
        assert r["n_candidates"] == len(cand)
        # the tiebreak guarantees a usable pair whenever the group has >= 2
        assert r["chosen_doc_id"] != r["rejected_doc_id"]


def test_mode_exact_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    per_user: dict = defaultdict(Counter)
    for r in rows:
        per_user[r["user_id"]][r["event_type"]] += 1
    got = {
        r["user_id"]: r
        for r in SPECS["agg_mode_exact"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_user)
    for uid, cnts in per_user.items():
        mode = min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        r = got[uid]
        assert r["mode_event_type"] == mode[0]
        assert r["mode_cnt"] == mode[1]
        assert r["n_events"] == sum(cnts.values())
        assert r["n_distinct_types"] == len(cnts)
        assert r["mode_cnt"] * r["n_distinct_types"] >= r["n_events"]


def test_cusum_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict = defaultdict(int)
    for r in rows:
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    days = sorted(daily)
    n, tot = len(days), sum(daily.values())
    best = None
    cum = 0
    for t, day in enumerate(days, start=1):
        cum += daily[day]
        s_abs = abs(n * cum - t * tot)
        key = (-s_abs, day)
        if best is None or key < best[0]:
            best = (key, day, t, cum, s_abs)
    _, cp_day, cp_t, cum_cp, s_abs = best
    got = SPECS["ts_changepoint_cusum"].fn(spark, sf_dir).collect()[0]
    assert got["cp_day"] == cp_day
    assert got["cp_t"] == cp_t
    assert got["n_days"] == n
    assert got["s_abs_scaled"] == s_abs
    assert got["left_mean_cents"] == int(round(cum_cp * 1.0 / cp_t))
    assert got["right_mean_cents"] == int(
        round((tot - cum_cp) * 1.0 / (n - cp_t))
    )
    # the maximizing split is strictly inside the series (S_n = 0)
    assert 1 <= cp_t < n
