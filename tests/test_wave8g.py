"""Round-8 wave G: Spearman rho, truncated harmonic centrality."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_spearman_matches_scipy_free_python(spark, sf_dir):
    import pyspark.sql.functions as F

    from etl_caic_spark.sources import load_table

    row = SPECS["stat_spearman"].fn(spark, sf_dir).collect()[0]
    assert -1000000 <= row["rho_micro"] <= 1000000
    # recompute with the same frozen tie order in pure Python
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"))
        .collect()
    )
    bal = {
        r["c_custkey"]: round(r["c_acctbal"] * 100)
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    base = [(bal[r["o_custkey"]], r["rev"], r["o_custkey"]) for r in orders]
    n = len(base)
    rx = {k: i + 1 for i, (_, _, k) in enumerate(sorted(base, key=lambda t: (t[0], t[2])))}
    ry = {k: i + 1 for i, (_, _, k) in enumerate(sorted(base, key=lambda t: (t[1], t[2])))}
    d2 = sum((rx[k] - ry[k]) ** 2 for _, _, k in base)
    assert (row["n"], row["d2"]) == (n, d2)
    denom = n * (n * n - 1)
    assert abs(row["rho_micro"] - (denom - 6 * d2) * 1000000.0 / denom) <= 0.5


def test_harmonic_layers_partition_reachable_set(spark, sf_dir):
    import pyspark.sql.functions as F

    from etl_caic_spark.sources import load_table

    rows = SPECS["graph_harmonic_centrality"].fn(spark, sf_dir).collect()
    assert rows
    # rebuild adjacency and BFS in Python for a handful of vertices
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    dst = (F.col("user_id") * 7 + F.col("event_id")) % 150
    edges = (
        ev.select(
            F.least(F.col("user_id"), dst).alias("a"),
            F.greatest(F.col("user_id"), dst).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r["a"], set()).add(r["b"])
        adj.setdefault(r["b"], set()).add(r["a"])
    got = {r["user_id"]: r for r in rows}
    assert set(got) == set(adj)
    for v in sorted(adj)[:10]:
        seen = {v}
        frontier = {v}
        sizes = []
        for _ in range(3):
            frontier = {u for t in frontier for u in adj[t]} - seen
            sizes.append(len(frontier))
            seen |= frontier
        r = got[v]
        assert (r["n1"], r["n2"], r["n3"]) == tuple(sizes), (v, sizes, r)
        assert r["harmonic_micro"] == (
            sizes[0] * 1000000 + sizes[1] * 500000 + sizes[2] * 333333
        )
