"""Round-8 wave F: Cohen's kappa, Gini coefficient."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_cohen_kappa_against_pure_python(spark, sf_dir):
    from collections import Counter

    from etl_caic_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type").collect()
    sides = {}
    for r in ev:
        sides.setdefault(r["event_id"] // 2, {})[r["event_id"] % 2] = r["event_type"]
    pairs = [(v[0], v[1]) for v in sides.values() if 0 in v and 1 in v]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    s = sum(ra[lbl] * rb.get(lbl, 0) for lbl in ra)
    row = SPECS["eval_cohen_kappa"].fn(spark, sf_dir).collect()[0]
    assert (row["n_items"], row["n_agree"], row["chance_sum"]) == (n, agree, s)
    expect = (n * agree - s) * 1000000.0 / (n * n - s)
    assert abs(row["kappa_micro"] - expect) <= 0.5
    # kappa is bounded by [-1, 1]
    assert -1000000 <= row["kappa_micro"] <= 1000000


def test_gini_bounds_and_invariance(spark, sf_dir):
    row = SPECS["analytics_gini"].fn(spark, sf_dir).collect()[0]
    # revenue Gini of a real distribution: strictly inside (0, 1)
    assert 0 < row["gini_micro"] < 1000000
    assert row["s1"] <= row["n"] * row["s0"]
    # rank formula identity: recompute from a sorted pull
    from etl_caic_spark.sources import load_table
    import pyspark.sql.functions as F

    rev = sorted(
        (r["cents"], r["o_custkey"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .collect()
    )
    n = len(rev)
    s0 = sum(c for c, _ in rev)
    s1 = sum((i + 1) * c for i, (c, _) in enumerate(rev))
    assert (row["n"], row["s0"], row["s1"]) == (n, s0, s1)


def test_gini_extremes():
    # sanity of the closed form itself: equal incomes -> 0; one-holder -> (n-1)/n
    def gini(xs):
        xs = sorted(xs)
        n = len(xs)
        s0 = sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s1 - (n + 1) * s0) / (n * s0)

    assert gini([5, 5, 5, 5]) == 0
    assert abs(gini([0, 0, 0, 10]) - 0.75) < 1e-12
