"""Property tests for the round-9 wave H queries beyond the oracle
differential."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_tiff_codec_covers_both_layouts(spark, sf_dir):
    rows = SPECS["multimodal_tiff_codec"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    chans = {r["channels"] for r in rows}
    assert chans == {1, 3}  # grey AND RGB photometric layouts exercised
    for r in rows:
        assert r["n_values"] == r["width"] * r["height"] * r["channels"]
        assert 0 <= r["value_min"] <= r["value_max"] <= 255


def test_krippendorff_brackets_fleiss(spark, sf_dir):
    """Same raters, same cells: alpha and kappa differ only by the
    (n-1) pairwise correction, so they must sit within ~1/n of each
    other — and their shared integer moments must agree exactly."""
    a = SPECS["eval_krippendorff_alpha"].fn(spark, sf_dir).collect()[0]
    k = SPECS["eval_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert a["n_items"] == k["n_items"]
    assert a["chance_sq_sum"] == k["chance_sq_sum"]
    n = a["n_items"] * 3
    tol = 2_000_000 // n + 2  # micro-units; correction is O(1/n)
    assert abs(a["alpha_micro"] - k["kappa_micro"]) <= tol, (
        a["alpha_micro"],
        k["kappa_micro"],
        tol,
    )


def test_fixed_width_row_count_and_types(spark, sf_dir):
    df = SPECS["scan_fixed_width"].fn(spark, sf_dir)
    rows = df.collect()
    from pyspark.sql import functions as F

    expect = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 19 == 0)
        .count()
    )
    assert len(rows) == expect
    assert df.schema.simpleString() == (
        "struct<l_orderkey:bigint,l_linenumber:int,"
        "l_returnflag:string,qty:bigint>"
    )
    assert all(r["l_orderkey"] % 19 == 0 for r in rows)
    assert all(1 <= r["qty"] <= 50 for r in rows)
