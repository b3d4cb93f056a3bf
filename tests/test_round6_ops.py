"""Round-6 extension wave: selection operator properties and plan-shape
pins for the new queries. Value-level correctness vs DuckDB is covered
by tests/test_oracle.py."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_kth_smallest_matches_sorted_reference(spark):
    """Histogram bisection vs sorted() on adversarial integer data:
    negatives, heavy duplicates, and a domain wide enough to force
    several bisection rounds (range >> 4096 cells)."""
    from etl_caic_spark.operators.selection import kth_smallest

    vals = [((i * 2654435761) % 10_000_003) - 5_000_000 for i in range(977)]
    vals += [42] * 300 + [-5_000_000, 4_999_999]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ordered = sorted(vals)
    n = len(vals)
    for k in (1, 2, n // 4, (n + 1) // 2, n - 1, n):
        assert kth_smallest(df, "x", k) == ordered[k - 1], f"k={k}"


def test_kth_smallest_full_width_bigint_domain(spark):
    """Round-7 ADVICE regression: on a full-width int64 domain the
    first bisection round's (c - lo) offset overflows bigint; the
    DECIMAL(38,0) ladder must keep the cell walk exact."""
    from etl_caic_spark.operators.selection import kth_smallest

    lo, hi = -(2**63), 2**63 - 1
    vals = [lo, lo + 1, -17, 0, 3, 99, 2**62, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ordered = sorted(vals)
    for k in (1, 3, 5, len(vals)):
        assert kth_smallest(df, "x", k) == ordered[k - 1], f"k={k}"


def test_kth_smallest_single_value_domain(spark):
    from etl_caic_spark.operators.selection import kth_smallest

    df = spark.createDataFrame([(7,)] * 50, "x long")
    assert kth_smallest(df, "x", 25) == 7


def test_median_selection_has_no_sort_or_window(spark, sf_dir):
    """The selection query's aggregates must stay windowless and
    sortless — the whole point of the operator. (The returned 1-row
    relation is a local plan; assert on the operator's internal scans
    instead: run it and check no windowed/sorted stage was needed by
    re-deriving through the histogram agg plan.)"""
    from etl_caic_spark.sources import load_table

    t = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    agg = t.filter((F.col("c") >= 0) & (F.col("c") <= 10**9)).groupBy(
        F.expr("(CAST(`c` AS BIGINT) - 0) DIV 244141").alias("cell")
    ).count()
    plan = _optimized_plan(agg)
    assert "windowspecdefinition" not in plan
    assert "Sort" not in plan


def test_negative_sampling_deterministic_and_covers_anchors(spark, sf_dir):
    df = SPECS["ml_negative_sampling"].fn(spark, sf_dir)
    rows = df.collect()
    again = {
        (r["vec_id"], r["j"]): r["neg_vec_id"]
        for r in SPECS["ml_negative_sampling"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert again[(r["vec_id"], r["j"])] == r["neg_vec_id"]
    anchors = {r["vec_id"] for r in rows}
    n = (
        SPECS["ml_negative_sampling"]
        .fn(spark, sf_dir)
        .select("vec_id")
        .distinct()
        .count()
    )
    assert len(anchors) == n  # every anchor drew all its candidates


def test_token_length_batches_windows_partitioned(spark, sf_dir):
    plan = _optimized_plan(SPECS["token_length_batches"].fn(spark, sf_dir))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_gid" in spec, f"unpartitioned window:\n{spec}"


def test_time_decay_credits_sum_to_one_per_purchase(spark, sf_dir):
    df = SPECS["attrib_time_decay"].fn(spark, sf_dir)
    sums = (
        df.groupBy("purchase_id")
        .agg(F.round(F.sum("credit"), 3).alias("s"))
        .collect()
    )
    for r in sums:
        # per-touch rounding to 1e-6 can drift the sum by n_touches ulps
        assert abs(r["s"] - 1.0) < 0.01, r


def test_kth_smallest_multi_matches_sorted_reference(spark):
    """The round-11 shared-scan generalization: several ks (duplicated,
    extreme, and mid-range — some resolving in different bisection
    rounds) against sorted() on the same adversarial data, plus the
    bounds-job n."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    vals = [((i * 2654435761) % 10_000_003) - 5_000_000 for i in range(977)]
    vals += [42] * 300 + [-5_000_000, 4_999_999]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ordered = sorted(vals)
    n_want = len(vals)
    ks = [1, 2, n_want // 4, (n_want + 1) // 2, (n_want + 1) // 2,
          n_want - 1, n_want]
    n, got = kth_smallest_multi(df, "x", lambda n: ks)
    assert n == n_want
    assert got == [ordered[k - 1] for k in ks]


def test_kth_smallest_multi_full_width_bigint_domain(spark):
    """Every range leg must keep the DECIMAL(38,0) ladder when the
    domain forces it, even in the multi-range CASE."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    lo, hi = -(2**63), 2**63 - 1
    vals = [lo, lo + 1, -17, 0, 3, 99, 2**62, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ordered = sorted(vals)
    n, got = kth_smallest_multi(df, "x", lambda n: [1, 3, 5, n])
    assert n == len(vals)
    assert got == [ordered[0], ordered[2], ordered[4], ordered[-1]]


def test_kth_smallest_multi_rejects_bad_k(spark):
    import pytest as _pytest

    from etl_caic_spark.operators.selection import kth_smallest_multi

    df = spark.createDataFrame([(v,) for v in range(10)], "x long")
    with _pytest.raises(ValueError):
        kth_smallest_multi(df, "x", lambda n: [0])
    with _pytest.raises(ValueError):
        kth_smallest_multi(df, "x", lambda n: [n + 1])


def test_kth_smallest_multi_degenerate_inputs(spark):
    """r11 ADVICE: empty ks must early-return (n, []) BEFORE touching
    the bounds row — on an empty frame lo/hi are None, and with no ks
    the scan legs would build malformed CASE/filter expressions."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    empty = spark.createDataFrame([], "x long")
    assert kth_smallest_multi(empty, "x", lambda n: []) == (0, [])
    ten = spark.range(10).selectExpr("id AS x")
    assert kth_smallest_multi(ten, "x", lambda n: []) == (10, [])
