"""Plan and semantics pins for the eighth relational wave (round 5):
the bitmap-distinct rewrite must aggregate WITHOUT an Expand node (the
thing that makes COUNT(DISTINCT) expensive), NOT IN three-valued logic
must behave per the SQL standard, and CDC apply must drop tombstoned
keys. Value-level correctness is covered by tests/test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caic_spark.registry import all_specs
from etl_caic_spark.sources import load_table

SPECS = all_specs()


def test_bitmap_distinct_plan_has_no_expand(spark, sf_dir):
    df = SPECS["agg_bitmap_distinct"].fn(spark, sf_dir)
    df.collect()  # finalize THIS queryExecution's AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # judge the final plan only
    assert "Expand" not in plan, "bitmap rewrite must not plan an Expand"
    # two hash-aggregate levels (chunk OR, then popcount sum), both inside
    # whole-stage codegen (the "*(n)" markers in the final plan string)
    ha_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert len(ha_lines) >= 2
    assert all("*(" in ln for ln in ha_lines)


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    expected = {
        r["event_type"]: (r["n"], r["h"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.countDistinct(F.when(F.col("value") > 250, F.col("user_id"))).alias(
                "h"
            ),
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["n_users"], r["n_heavy_users"])
        for r in SPECS["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_not_in_three_valued_logic(spark, sf_dir):
    row = SPECS["subquery_not_in_nulls"].fn(spark, sf_dir).collect()[0]
    # one NULL in the list makes every NOT IN predicate UNKNOWN -> 0 rows
    assert row["n_not_in_polluted"] == 0
    # NOT EXISTS ignores the NULLs, so it equals NOT IN over the clean list
    assert row["n_not_exists"] == row["n_not_in_clean"]
    assert row["n_not_in_clean"] > 0


def test_cdc_apply_drops_tombstoned_keys(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    last = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "event_type")
        .collect()
    )
    deleted = {r["user_id"] for r in last if r["event_type"] == "error"}
    kept = {r["user_id"] for r in SPECS["cdc_apply_changes"].fn(spark, sf_dir).collect()}
    assert kept.isdisjoint(deleted)
    all_users = {r["user_id"] for r in last}
    assert kept == all_users - deleted
