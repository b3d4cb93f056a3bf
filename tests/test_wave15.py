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


def test_dpo_pairs_all_tied_group_still_yields_distinct_pair(spark):
    """The opposite doc_id tiebreaks are the guarantee: a group whose
    candidates ALL share one score must still produce
    chosen != rejected (chosen = smallest id, rejected = largest)."""
    from pyspark.sql import functions as F

    rows = [(7, "s0", "en", 100), (9, "s0", "en", 100), (8, "s0", "en", 100),
            (1, "s1", "de", 50)]  # singleton group must be filtered out
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )
    # route the registered fn through a temp-view-free path: monkeypatch
    # load_table is heavier than re-deriving the body, so just exercise
    # the same expressions on the synthetic frame
    key = F.concat(
        F.lpad(F.col("n_chars").cast("string"), 10, "0"),
        F.lit("|"),
        F.lpad((F.lit(99999999) - F.col("doc_id")).cast("string"), 10, "0"),
    )
    cand = df.select("source", "lang", "doc_id", "n_chars", key.alias("k"))
    out = (
        cand.groupBy("source", "lang")
        .agg(
            F.expr("max_by(doc_id, k)").alias("chosen"),
            F.expr("min_by(doc_id, k)").alias("rejected"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert (r["chosen"], r["rejected"]) == (7, 9)  # smallest vs largest id


def test_cusum_constant_series_ties_to_earliest_day(spark):
    """A constant series has S_t = 0 everywhere; the (-|S|, day) argmax
    key must break the all-tied case to the EARLIEST day, and the
    right-side mean stays defined (cp_t < n)."""
    import datetime

    from pyspark.sql import functions as F

    days = [(datetime.date(2024, 1, d), 100) for d in range(1, 11)]
    daily = spark.createDataFrame(days, "day date, cents long")
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day")
    cum = daily.select(
        "day",
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
        F.row_number().over(w).cast("bigint").alias("t"),
    )
    s = cum.crossJoin(F.broadcast(tot)).select(
        "day", "t", "n",
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("cum")
            - F.col("t").cast("decimal(38,0)") * F.col("tot")
        ).alias("s_abs"),
    )
    best = (
        s.agg(F.min(F.struct((-F.col("s_abs")).alias("neg"), "day", "t", "n")).alias("b"))
        .select("b.*")
        .collect()[0]
    )
    assert best["day"] == datetime.date(2024, 1, 1)
    assert best["t"] == 1 and best["t"] < best["n"]
