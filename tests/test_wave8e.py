"""Round-8 wave E: BPE merge learning, dataset fingerprint."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_bpe_merges_against_pure_python(spark, sf_dir):
    """Re-learn the 3 merges in pure Python with the SAME frozen
    semantics (double non-overlapping replace) and compare."""
    from collections import Counter

    from etl_caic_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    wf = Counter()
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                wf[w] += 1
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    vocab = [(f, " " + " ".join(w) + " ") for w, f in top]

    expect = []
    for _ in range(3):
        pc = Counter()
        for f, sym in vocab:
            ws = sym.strip().split(" ")
            for a, b in zip(ws, ws[1:]):
                pc[(a, b)] += f
        (l, r), wt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((l, r, l + r, wt))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        vocab = [(f, s.replace(pat, rep).replace(pat, rep)) for f, s in vocab]

    got = sorted(
        SPECS["bpe_learn_merges"].fn(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert len(got) == 3
    for row, (l, r, m, wt) in zip(got, expect):
        assert (row["left_sym"], row["right_sym"], row["merged"], row["wt"]) == (
            l,
            r,
            m,
            wt,
        ), (row, (l, r, m, wt))


def test_fingerprint_order_and_partition_invariance(spark, sf_dir):
    import pyspark.sql.functions as F

    base = {r["source"]: r for r in
            SPECS["dq_dataset_fingerprint"].fn(spark, sf_dir).collect()}
    assert "__all__" in base
    # rolled-up row counts are consistent
    assert base["__all__"]["n_rows"] == sum(
        r["n_rows"] for s, r in base.items() if s != "__all__"
    )
    # xor of slice xors equals the global xor (disjoint slices)
    acc = 0
    for s, r in base.items():
        if s != "__all__":
            acc ^= r["fp_xor"]
    assert acc == base["__all__"]["fp_xor"]
    # recompute under a hostile repartition: fingerprints must not move
    from etl_caic_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").repartition(17, "lang")
    d.createOrReplaceTempView("_fp_shuffled")
    hx = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
            F.md5("text"),
        )
    )
    v = F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint")
    again = (
        d.select(v.alias("v"))
        .agg(
            (F.sum(F.col("v").cast("decimal(38,0)")) % F.lit(2305843009213693952))
            .cast("bigint")
            .alias("fp_sum")
        )
        .collect()[0]["fp_sum"]
    )
    assert again == base["__all__"]["fp_sum"]
