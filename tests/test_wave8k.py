"""Round-8 wave K: Fleiss' kappa."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_fleiss_kappa_python_replay(spark, sf_dir):
    from collections import Counter

    from etl_caic_spark.sources import load_table

    row = SPECS["eval_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert -1000000 <= row["kappa_micro"] <= 1000000
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type").collect()
    items: dict = {}
    for r in ev:
        items.setdefault(r["event_id"] // 3, []).append(r["event_type"])
    full = {k: v for k, v in items.items() if len(v) == 3}
    n = len(full)
    sq = sum(c * c for v in full.values() for c in Counter(v).values())
    cj = Counter()
    for v in full.values():
        cj.update(v)
    c2 = sum(c * c for c in cj.values())
    assert (row["n_items"], row["agree_sum"], row["chance_sq_sum"]) == (
        n,
        sq - 3 * n,
        c2,
    )
    # float reference via the textbook P-bar / Pe-bar formulation
    m = 3
    p_bar = (sq - n * m) / (n * m * (m - 1))
    pe_bar = sum((c / (n * m)) ** 2 for c in cj.values())
    kappa = (p_bar - pe_bar) / (1 - pe_bar)
    assert abs(row["kappa_micro"] - kappa * 1e6) <= 1.0
