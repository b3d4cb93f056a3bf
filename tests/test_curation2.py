"""Semantic invariants for the round-8 curation wave (plans/curation2q)
— properties the differential oracle can't state, e.g. that exact
document copies collapse to zero kept paragraphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_cdc_copies_fully_deduped(spark, sf_dir):
    out = SPECS["dedup_paragraph_cdc"].fn(spark, sf_dir)
    copies = out.filter(F.col("doc_id") >= 1000000)
    assert copies.count() > 0
    # An exact copy's every chunk already occurred at a lower ordinal in
    # the original document, so reconstruction keeps nothing.
    assert copies.filter(F.col("n_kept") > 0).count() == 0


def test_cdc_kept_equals_distinct_chunks(spark, sf_dir):
    out = SPECS["dedup_paragraph_cdc"].fn(spark, sf_dir)
    row = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_chunks").alias("total")
    ).first()
    # First-occurrence keep means exactly one survivor per distinct
    # chunk text; duplicates exist by construction, so kept < total.
    assert 0 < row["kept"] < row["total"]


def test_mixture_temperature_flattens(spark, sf_dir):
    out = SPECS["data_mixture_temperature"].fn(spark, sf_dir).collect()
    total_ppm = sum(r["weight_ppm"] for r in out)
    # div truncation loses at most 1 ppm per slice.
    assert 1_000_000 - len(out) <= total_ppm <= 1_000_000
    # Temperature < 1 upweights small slices: the smallest natural
    # slice must get a larger share than its natural proportion, the
    # largest a smaller one.
    tn = sum(r["n_natural"] for r in out)
    smallest = min(out, key=lambda r: r["n_natural"])
    largest = max(out, key=lambda r: r["n_natural"])
    assert smallest["weight_ppm"] * tn > smallest["n_natural"] * 1_000_000
    assert largest["weight_ppm"] * tn < largest["n_natural"] * 1_000_000


def test_perplexity_buckets_cover_corpus(spark, sf_dir):
    out = SPECS["text_perplexity_buckets"].fn(spark, sf_dir)
    counts = {r["bucket"]: r["n"] for r in
              out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"head", "middle", "tail"}
    n = sum(counts.values())
    # Tertile cuts with ties can only grow the lower buckets.
    assert counts["head"] >= n // 3 - 1


def test_gopher_rules_all_live(spark, sf_dir):
    out = SPECS["quality_gopher_rules"].fn(spark, sf_dir)
    row = out.agg(
        *[
            F.sum(c).alias(c)
            for c in (
                "n_docs",
                "n_fail_wordcount",
                "n_fail_meanwordlen",
                "n_fail_stopwords",
                "n_fail_topword",
                "n_fail_dupbigram",
                "n_pass",
            )
        ]
    ).first()
    # Every rule has a live fail population, and some docs survive all
    # five — i.e., no rule is degenerate on this corpus.
    for c in (
        "n_fail_wordcount",
        "n_fail_meanwordlen",
        "n_fail_stopwords",
        "n_fail_topword",
        "n_fail_dupbigram",
        "n_pass",
    ):
        assert row[c] > 0, c
    assert row["n_pass"] < row["n_docs"]


def test_hll_accuracy_and_merge(spark, sf_dir):
    rows = {r["grp"]: r for r in
            SPECS["sketch_hll_distinct"].fn(spark, sf_dir).collect()}
    assert "__all__" in rows and len(rows) == 4
    for grp, r in rows.items():
        err = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        # m = 256 registers -> ~6.5% standard error; 3 sigma bound.
        assert err < 0.20, (grp, err)
    # Merged registers estimate the union, which is at least as large as
    # any constituent group's estimate.
    assert rows["__all__"]["est_distinct"] >= max(
        r["est_distinct"] for g, r in rows.items() if g != "__all__"
    )
