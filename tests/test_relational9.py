"""Pins for the ninth wave: MERGE arm semantics (deletes gone, updates
applied, inserts present, untouched rows intact) and nearest-as-of
invariants (gap within tolerance, true nearest). Value-level parity is
covered by tests/test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_merge_full_arm_semantics(spark, sf_dir):
    base = {
        r["c_custkey"]: r
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    out = {r["c_custkey"]: r for r in SPECS["merge_full"].fn(spark, sf_dir).collect()}
    deleted = [k for k in base if k % 7 == 0]
    updated = [k for k in base if k % 7 == 1]
    untouched = [k for k in base if k % 7 > 2]
    assert all(k not in out for k in deleted)
    assert all(out[k]["c_mktsegment"] == "MERGED" for k in updated)
    assert all(out[k + 2000000]["c_mktsegment"] == "INSERTED" for k in base if k % 7 == 2)
    assert all(out[k]["c_mktsegment"] == base[k]["c_mktsegment"] for k in untouched)
    assert len(out) == len(base) - len(deleted) + sum(1 for k in base if k % 7 == 2)


def test_asof_nearest_is_nearest(spark, sf_dir):
    out = SPECS["join_asof_nearest"].fn(spark, sf_dir)
    matched = out.filter(F.col("click_id").isNotNull())
    assert matched.count() > 0
    # tolerance respected
    assert matched.filter(F.col("gap_us") > 3_600_000_000).count() == 0
    # spot-verify "nearest" for the purchase with the LARGEST chosen gap:
    # no other click can be closer (else the window rank was wrong)
    worst = matched.orderBy(F.desc("gap_us"), "purchase_id").first()
    ev = load_table(spark, sf_dir, "events")
    p_ts = ev.filter(F.col("event_id") == worst["purchase_id"]).first()["ts"]
    closer = (
        ev.filter(
            (F.col("event_type") == "click")
            & (F.col("user_id") == worst["user_id"])
        )
        .select(
            F.abs(
                F.unix_micros(F.lit(p_ts)) - F.unix_micros("ts")
            ).alias("gap")
        )
        .agg(F.min("gap").alias("m"))
        .first()["m"]
    )
    assert closer == worst["gap_us"]


def _final_plan(df):
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_q7_broadcasts_nation_twice(spark, sf_dir):
    plan = _final_plan(SPECS["tpch_q7_shape"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_sliding_distinct_plan_has_no_expand(spark, sf_dir):
    plan = _final_plan(SPECS["win_sliding_distinct"].fn(spark, sf_dir))
    assert "Expand" not in plan
    assert "Window" in plan  # the RANGE-frame bit_or pass
