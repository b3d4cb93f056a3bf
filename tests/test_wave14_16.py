"""Semantic property tests for waves 14-16: pin the claims the oracles
alone can't state — geometric ground truth for the ray-cast, sketch
estimate sanity against exact overlaps, SSSP invariants, weighted-sample
reproducibility, and the null-safe join's no-silent-drop guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_point_in_polygon_ground_truth(spark, sf_dir):
    """Polygon 0 is a star centered at (0,0) with radius 300..900: the
    center must count as inside, a far point outside. Verified through
    the same integer ray-cast the query uses, on handmade points."""
    import math

    verts = []
    for k in range(8):
        r = 600 + 300 * (k % 2)
        verts.append(
            (round(r * math.cos(2 * math.pi * k / 8)),
             round(r * math.sin(2 * math.pi * k / 8)))
        )

    def inside(px, py):
        n = 0
        for i in range(8):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % 8]
            if (y1 > py) != (y2 > py):
                lhs = (px - x1) * (y2 - y1)
                rhs = (py - y1) * (x2 - x1)
                if (lhs < rhs) if y2 > y1 else (lhs > rhs):
                    n += 1
        return n % 2 == 1

    assert inside(0, 0)
    assert inside(500, 0)  # inside the long spike
    assert not inside(2000, 2000)
    assert not inside(0, 880)  # between spikes — star concavity


def test_sssp_matches_exact_bellman_ford(spark, sf_dir):
    """Replay the identical 4-round Bellman-Ford in plain Python over
    the same derived edge list — the distributed result must match the
    sequential one exactly (integer min-plus has one right answer)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = [
        (r["src"], r["dst"], (r["src"] + r["dst"]) % 9 + 1)
        for r in seq.filter(
            F.col("src").isNotNull() & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .collect()
    ]
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    dist = {v: 0 for v in nodes if v % 29 == 0}
    for _ in range(4):
        nxt = dict(dist)
        for s, d, wgt in edges:
            if s in dist and dist[s] + wgt < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + wgt
        dist = nxt
    got = {
        r["user_id"]: r["dist"]
        for r in SPECS["graph_sssp_weighted"].fn(spark, sf_dir).collect()
    }
    assert got == dist


def test_kmv_setops_estimates_track_exact(spark, sf_dir):
    est = {
        (r["seg_a"], r["seg_b"]): r
        for r in SPECS["sketch_kmv_setops"].fn(spark, sf_dir).collect()
    }
    assert len(est) == 10  # C(5,2) segment pairs
    ev = load_table(spark, sf_dir, "events")
    pairs = list(est)[:3]  # spot-check a few exactly
    for sa, sb in pairs:
        ua = {r[0] for r in ev.filter(F.col("event_type") == sa)
              .select("user_id").distinct().collect()}
        ub = {r[0] for r in ev.filter(F.col("event_type") == sb)
              .select("user_id").distinct().collect()}
        exact_union = len(ua | ub)
        exact_jacc = len(ua & ub) / exact_union
        r = est[(sa, sb)]
        assert 0.0 <= r["jaccard_est"] <= 1.0
        # k=64 ⇒ ~1/√62 ≈ 13% rel error; allow 3σ-ish slack
        assert abs(r["union_est"] - exact_union) / exact_union < 0.45
        assert abs(r["jaccard_est"] - exact_jacc) < 0.3


def test_weighted_sample_reproducible_and_size_biased(spark, sf_dir):
    a = SPECS["sample_weighted_topk"].fn(spark, sf_dir).collect()
    b = SPECS["sample_weighted_topk"].fn(spark, sf_dir).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 50
    d = load_table(spark, sf_dir, "documents")
    mean_all = d.agg(F.avg("n_chars")).first()[0]
    mean_sample = sum(r["n_chars"] for r in a) / len(a)
    # size-weighted draw must skew toward longer documents
    assert mean_sample > mean_all


def test_null_safe_join_keeps_null_bucket(spark, sf_dir):
    rows = {r["bucket_label"]: r for r in
            SPECS["join_null_safe"].fn(spark, sf_dir).collect()}
    assert "b-1" in rows, "NULL bucket must survive the null-safe join"
    assert rows["b-1"]["n_events"] > 0
    ev = load_table(spark, sf_dir, "events")
    n_null = ev.filter(F.col("user_id") % 50 == 13).count()
    assert rows["b-1"]["n_events"] == n_null
