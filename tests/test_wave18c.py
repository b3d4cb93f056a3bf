"""Wave-18c behavioral tests: a third independent DTW implementation
(plain dict-based DP, no band-row optimization) replays ts_dtw_band from
the raw fixture; structural laws pin the band semantics."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()

L, W, USERS = 16, 4, 6


def _series(rows):
    daily = defaultdict(int)
    for r in rows:
        if r["user_id"] >= USERS:
            continue
        day = r["ts"].day
        if day > L:
            continue
        cents = int(
            Decimal(str(r["value"] * 100)).quantize(Decimal(1), ROUND_HALF_UP)
        )
        daily[(r["user_id"], day)] += cents
    return {
        u: [daily.get((u, d), 0) for d in range(1, L + 1)]
        for u in range(USERS)
    }


def _dtw(a, b):
    dp = {}
    for i in range(1, L + 1):
        for j in range(max(1, i - W), min(L, i + W) + 1):
            c = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                dp[(1, 1)] = c
                continue
            best = min(
                dp.get((i - 1, j), float("inf")),
                dp.get((i, j - 1), float("inf")),
                dp.get((i - 1, j - 1), float("inf")),
            )
            dp[(i, j)] = c + best
    return dp[(L, L)]


def test_dtw_band_matches_python_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    s = _series(rows)
    expected = {}
    for ua in range(USERS):
        for ub in range(ua + 1, USERS):
            l1 = sum(abs(x - y) for x, y in zip(s[ua], s[ub]))
            expected[(ua, ub)] = (_dtw(s[ua], s[ub]), l1)
    got = {
        (r["user_a"], r["user_b"]): (r["dtw_cents"], r["l1_cents"])
        for r in SPECS["ts_dtw_band"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == USERS * (USERS - 1) // 2
    for (ua, ub), (dtw, l1) in got.items():
        # the diagonal path is band-admissible, so DTW never exceeds L1
        assert dtw <= l1, (ua, ub)
    # warping must actually help somewhere on the fixture (non-vacuous)
    assert any(dtw < l1 for dtw, l1 in got.values())


def test_dtw_is_symmetric_and_zero_on_self(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    s = _series(rows)
    for u in range(USERS):
        assert _dtw(s[u], s[u]) == 0
    for ua in range(USERS):
        for ub in range(ua + 1, USERS):
            # symmetric band + symmetric cost => symmetric distance
            assert _dtw(s[ua], s[ub]) == _dtw(s[ub], s[ua])
