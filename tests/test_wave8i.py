"""Round-8 wave I: TF-IDF cosine similarity join, Theil index."""

from __future__ import annotations

import math

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_tfidf_cosine_bounds_and_order(spark, sf_dir):
    rows = SPECS["sim_tfidf_cosine_topk"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    scores = [r["cosine_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["dot"] > 0
        # cosine can exceed 1 only by the final rounding half-ulp
        assert 0 < r["cosine_micro"] <= 1000001
    # planted near-dups in the fixture corpus: the top pair should be
    # essentially parallel vectors
    assert scores[0] > 900000


def test_tfidf_cosine_spot_check_pair(spark, sf_dir):
    """Recompute the top pair's cosine from raw term vectors in Python."""
    import pyspark.sql.functions as F
    from collections import Counter

    from etl_caic_spark.sources import load_table

    top = SPECS["sim_tfidf_cosine_topk"].fn(spark, sf_dir).collect()[0]
    d = load_table(spark, sf_dir, "documents")
    texts = {
        r["doc_id"]: r["text"]
        for r in d.filter(F.col("doc_id").isin(top["doc_a"], top["doc_b"])).collect()
    }
    n_docs = d.count()
    # document frequencies for the two docs' terms
    all_terms = set()
    for t in texts.values():
        all_terms |= {w for w in t.split(" ") if w}
    df_rows = (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
        .filter(F.col("w").isin(*list(all_terms)))
        .groupBy("w")
        .count()
        .collect()
    )
    dfs = {r["w"]: r["count"] for r in df_rows}

    def iln(x):
        return round(round(math.log(x), 6) * 1e6)

    def vec(text):
        tf = Counter(w for w in text.split(" ") if w)
        return {
            w: c * (iln(n_docs) - iln(dfs[w]))
            for w, c in tf.items()
            if dfs[w] <= 150
        }
    va, vb = vec(texts[top["doc_a"]]), vec(texts[top["doc_b"]])
    dot = sum(va[w] * vb[w] for w in set(va) & set(vb))
    na = math.sqrt(sum(v * v for v in va.values()))
    nb = math.sqrt(sum(v * v for v in vb.values()))
    assert dot == top["dot"]
    assert abs(top["cosine_micro"] - dot * 1e6 / (na * nb)) <= 0.5


def test_theil_nonnegative_and_python_replay(spark, sf_dir):
    import pyspark.sql.functions as F

    from etl_caic_spark.sources import load_table

    row = SPECS["stat_theil_index"].fn(spark, sf_dir).collect()[0]
    # Theil-T >= 0, and <= ln(n) for any distribution
    assert 0 <= row["theil_micro"] <= round(round(math.log(row["n"]), 6) * 1e6)
    cents = [
        r["cents"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .collect()
    ]
    n, s = len(cents), sum(cents)

    def iln(x):
        return round(round(math.log(x), 6) * 1e6)

    xlx = sum(x * iln(x) for x in cents)
    # same floor(x+.5) rounding as both engines' HALF_UP
    expect = math.floor(xlx / s + 0.5) - iln(s) + iln(n)
    assert row["theil_micro"] == expect
