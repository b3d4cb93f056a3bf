"""Independent differentials for the round-10 wave14 queries: the
DuckDB oracles intentionally mirror the Spark expression trees (that is
what makes the hash comparable), so these tests recompute each metric
from the raw fixture with a THIRD, pure-Python implementation — a
shared formula mistake in query+oracle cannot survive an independent
derivation — plus closed-form invariants (JSD of a distribution with
itself is 0; recall audits are bounded by their k)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def _iln_py(x: int) -> int:
    return int(round(round(math.log(x), 6) * 1e6))


def test_mrr_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderpriority")
        .collect()
    )
    by_cust: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        h = hashlib.md5(f"mrr-v1|{r['o_orderkey']}".encode()).hexdigest()
        score = int(h[:8], 16)
        rel = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        by_cust.setdefault(r["o_custkey"], []).append(
            (-score, r["o_orderkey"], rel)
        )
    rr_sum, n_hit = 0, 0
    for cands in by_cust.values():
        cands.sort()
        first = next((i + 1 for i, c in enumerate(cands) if c[2]), None)
        if first is not None:
            n_hit += 1
            rr_sum += int(round(1_000_000.0 / first))
    want_mrr = int(round(rr_sum * 1.0 / len(by_cust)))

    got = SPECS["eval_mrr"].fn(spark, sf_dir).collect()[0]
    assert got["n_queries"] == len(by_cust)
    assert got["n_hit"] == n_hit
    assert got["mrr_micro"] == want_mrr


def test_jsd_matches_python_reference(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source").isin("src0", "src1"))
        .select("source", "text")
        .collect()
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        (ca if r["source"] == "src0" else cb).update(r["text"].split(" "))
    n1, n2 = sum(ca.values()), sum(cb.values())
    s1 = sum(
        c1 * (_iln_py(2 * c1 * n2) - _iln_py(c1 * n2 + cb.get(w, 0) * n1))
        for w, c1 in ca.items()
    )
    s2 = sum(
        c2 * (_iln_py(2 * c2 * n1) - _iln_py(ca.get(w, 0) * n2 + c2 * n1))
        for w, c2 in cb.items()
    )
    want = int(round(s1 / (2.0 * n1) + s2 / (2.0 * n2)))

    got = SPECS["stat_js_divergence"].fn(spark, sf_dir).collect()[0]
    assert got["n1_tokens"] == n1 and got["n2_tokens"] == n2
    assert got["jsd_micronat"] == want
    # bounds: 0 <= JSD <= ln 2 (693147 micro-nats); identical mixtures
    # would be 0, disjoint vocabularies exactly ln 2
    assert 0 <= got["jsd_micronat"] <= 693148


def test_jsd_of_identical_sources_is_zero(spark, sf_dir, monkeypatch):
    """p = q makes every log argument ratio 1: the divergence must be
    EXACTLY 0 (integer), not merely small."""
    from etl_caic_spark.plans import wave14b

    monkeypatch.setattr(wave14b, "_JSD_B", "src0")
    got = wave14b.stat_js_divergence(spark, sf_dir).collect()[0]
    assert got["jsd_micronat"] == 0


def test_wilcoxon_matches_python_reference(spark, sf_dir):
    import datetime

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", "o_orderdate")
        .collect()
    )
    split = datetime.datetime(1998, 1, 1)
    pc: dict[int, list[int]] = {}
    for r in rows:
        cents = int(round(r["o_totalprice"] * 100))
        xy = pc.setdefault(r["o_custkey"], [0, 0])
        xy[1 if r["o_orderdate"] >= split else 0] += cents
    diffs = [(abs(y - x), 1 if y > x else 0) for x, y in pc.values() if x != y]
    n = len(diffs)
    ties: Counter = Counter(d for d, _ in diffs)
    cum = 0
    mid_x2: dict[int, int] = {}
    for v in sorted(ties):
        cnt = ties[v]
        mid_x2[v] = 2 * (cum + cnt) - cnt + 1  # 2*cum_incl - cnt + 1
        cum += cnt
    t_plus_x2 = sum(mid_x2[d] for d, pos in diffs if pos)
    tie_term = sum(c**3 - c for c in ties.values())
    mu_x2 = n * (n + 1) // 2
    var_x48 = 2 * n * (n + 1) * (2 * n + 1) - tie_term
    want_z = int(
        round(((t_plus_x2 - mu_x2) / 2.0) / math.sqrt(var_x48 / 48.0) * 1e6)
    )

    got = SPECS["stat_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    assert got["n_pairs"] == n
    assert got["t_plus_x2"] == t_plus_x2
    assert got["mu_x2"] == mu_x2
    assert got["var_x48"] == var_x48
    assert got["z_micro"] == want_z


def test_kaplan_meier_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .collect()
    )
    spans: dict[int, list] = {}
    horizon_src = max(r["d"] for r in rows)
    import datetime

    horizon = horizon_src - datetime.timedelta(days=90)
    for r in rows:
        s = spans.setdefault(r["o_custkey"], [r["d"], r["d"]])
        s[0], s[1] = min(s[0], r["d"]), max(s[1], r["d"])
    base = [
        ((last - first).days + 1, 1 if last <= horizon else 0)
        for first, last in spans.values()
    ]
    grid: dict[int, list[int]] = {}
    for dur, ev in base:
        g = grid.setdefault(dur, [0, 0])
        g[0] += 1
        g[1] += ev
    want = {}
    n_risk = len(base)
    logsurv = 0
    for dur in sorted(grid):
        cnt, d = grid[dur]
        if d > 0:
            if n_risk > d:
                logsurv += _iln_py(n_risk - d) - _iln_py(n_risk)
                want[dur] = (n_risk, d, logsurv)
            else:
                want[dur] = (n_risk, d, None)
        n_risk -= cnt

    got = {
        r["duration_days"]: (
            r["n_risk"],
            r["n_events"],
            r["logsurv_micronat"],
        )
        for r in SPECS["stat_kaplan_meier"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # survival only decreases: log-survival is non-increasing over time
    vals = [v[2] for _, v in sorted(want.items()) if v[2] is not None]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_recall_audits_are_bounded(spark, sf_dir):
    """eval_pq_recall / eval_ivf_recall sanity: hits never exceed k,
    rates are consistent with the counts (the oracle hash certifies
    equality; this pins the metric's own semantics)."""
    pq = SPECS["eval_pq_recall"].fn(spark, sf_dir).collect()[0]
    assert 0 <= pq["n_hit"] <= pq["n_true"] <= 10
    assert pq["recall_micro"] == int(
        round(pq["n_hit"] * 1_000_000.0 / pq["n_true"])
    )
    for r in SPECS["eval_ivf_recall"].fn(spark, sf_dir).collect():
        assert 0 <= r["n_hit"] <= 5
        assert r["recall_micro"] == int(round(r["n_hit"] * 1_000_000.0 / 5))


def test_silhouette_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    pts = [(r["label"], [float(x) for x in r["embedding"]]) for r in rows]
    by_label: dict = {}
    for lab, e in pts:
        by_label.setdefault(lab, []).append(e)
    cent = {}
    for lab, vecs in by_label.items():
        n = len(vecs)
        cent[lab] = [
            sum(math.floor(v[d] * 1e6) for v in vecs) / (1e6 * n)
            for d in range(64)
        ]
    agg: dict = {}
    for lab, e in pts:
        d2 = {
            cl: sum(x * x for x in e)
            - 2 * sum(x * y for x, y in zip(e, c))
            + sum(y * y for y in c)
            for cl, c in cent.items()
        }
        a = math.sqrt(max(d2[lab], 0))
        b = math.sqrt(max(min(v for cl, v in d2.items() if cl != lab), 0))
        s = int(round((b - a) / max(a, b) * 1e6)) if max(a, b) > 0 else 0
        t = agg.setdefault(lab, [0, 0])
        t[0] += 1
        t[1] += s
    want = {
        lab: (n, int(round(tot * 1.0 / n))) for lab, (n, tot) in agg.items()
    }

    got = {
        r["label"]: (r["n_points"], r["mean_silhouette_micro"])
        for r in SPECS["eval_silhouette_labels"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # random embeddings have ~no cluster structure: every per-label
    # mean silhouette sits near zero (|s| < 0.1)
    assert all(abs(m) < 100_000 for _, m in got.values())


def test_rendezvous_shard_matches_python_and_is_stable(spark, sf_dir):
    """Rendezvous assignment equals the Python argmax, and the defining
    stability property holds: growing 16 -> 17 shards only moves keys
    TO the new shard — no document ever moves BETWEEN surviving shards
    (the property modulo hashing lacks: hash(x) % N rehomes ~all keys)."""
    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]

    def assign(doc, n):
        return max(
            range(n),
            key=lambda s: (
                hashlib.md5(f"{s}|{doc}".encode()).hexdigest(),
                f"{s:02d}",
            ),
        )

    want: dict = {}
    for doc in doc_ids:
        s = assign(doc, 16)
        t = want.setdefault(s, [0, None, None])
        t[0] += 1
        t[1] = doc if t[1] is None else min(t[1], doc)
        t[2] = doc if t[2] is None else max(t[2], doc)

    got = {
        r["shard"]: [r["n_docs"], r["min_doc"], r["max_doc"]]
        for r in SPECS["data_rendezvous_shard"].fn(spark, sf_dir).collect()
    }
    assert got == want

    moved = [
        doc for doc in doc_ids if assign(doc, 17) != assign(doc, 16)
    ]
    assert all(assign(doc, 17) == 16 for doc in moved), (
        "a key moved between surviving shards - rendezvous violated"
    )
    # expected churn ~ 1/17 of keys; allow generous slack
    assert len(moved) <= len(doc_ids) * 0.2


def test_holt_winters_matches_python_reference(spark, sf_dir):
    """Two references: (a) the closed-form coefficient dot recomputed in
    Python over an independently densified daily series must match the
    rounded Spark outputs EXACTLY (identical literals + identical
    left-to-right accumulation order); (b) simulating the actual
    Holt-Winters recurrence zero-initialized exactly depth+1 steps back
    — the definition the closed form compiles — must agree to ~1e-3 abs
    (same math, different float op order)."""
    import datetime

    from etl_caic_spark.plans.wave14f import (
        _HW_B,
        _HW_DEPTH,
        _HW_L,
        _HW_M,
        _HW_S,
    )

    rows = (
        load_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
        .collect()
    )
    daily: dict = {}
    for r in rows:
        daily[r["d"]] = daily.get(r["d"], 0) + int(round(r["o_totalprice"] * 100))
    lo, hi = min(daily), max(daily)
    days, ys = [], []
    d = lo
    while d <= hi:
        days.append(d)
        ys.append(float(daily.get(d, 0)))
        d += datetime.timedelta(days=1)

    def dot(coefs, idx):
        acc = coefs[0] * ys[idx]
        for j in range(1, len(coefs)):
            acc = acc + coefs[j] * (ys[idx - j] if idx - j >= 0 else 0.0)
        return acc

    want = {}
    for k in range(_HW_M):
        idx = len(ys) - 1 - k
        lvl, trd, snx = dot(_HW_L, idx), dot(_HW_B, idx), dot(_HW_S, idx)
        want[days[idx]] = (
            int(ys[idx]),
            round(lvl, 6),
            round(trd, 6),
            round(snx, 6),
            round(lvl + trd + snx, 6),
        )

    got = {
        r["day"]: (
            r["y_cents"],
            r["level_t"],
            r["trend_t"],
            r["season_next"],
            r["forecast_next"],
        )
        for r in SPECS["ts_holt_winters"].fn(spark, sf_dir).collect()
    }
    assert got == want

    # (b) direct recurrence, zero-init depth+1 steps before each output
    for day, (_, lvl6, trd6, snx6, _) in want.items():
        idx = days.index(day)
        start = idx - _HW_DEPTH
        l = b = 0.0
        ring = [0.0] * _HW_M
        for i in range(start, idx + 1):
            y = ys[i] if i >= 0 else 0.0
            s_season = ring[_HW_M - 1]
            nl = 0.5 * (y - s_season) + 0.5 * (l + b)
            nb = 0.5 * (nl - l) + 0.5 * b
            ns = 0.5 * (y - nl) + 0.5 * s_season
            ring = [ns] + ring[:-1]
            l, b = nl, nb
        assert abs(l - lvl6) < 1e-3 and abs(b - trd6) < 1e-3
        assert abs(ring[_HW_M - 1] - snx6) < 1e-3
