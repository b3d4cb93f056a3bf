"""Edge cases for the paginated REST source and the observe() metrics
surface (monitoring hooks a production pipeline attaches to every job)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_caic_spark.sources.rest import fetch_json_paginated

SCHEMA = T.StructType(
    [T.StructField("item_id", T.LongType()), T.StructField("val", T.LongType())]
)


def test_empty_collection_yields_empty_frame(spark):
    def api(url):
        return json.dumps({"items": [], "next": None})

    df = fetch_json_paginated(spark, "fake://x?page=0", SCHEMA, transport=api)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["item_id", "val"]


def test_max_pages_cap_fails_fast_on_cursor_loop(spark):
    def api(url):
        # malicious/buggy server: always points at itself
        return json.dumps({"items": [{"item_id": 1, "val": 2}], "next": url})

    with pytest.raises(RuntimeError, match="max_pages"):
        fetch_json_paginated(
            spark, "fake://loop?page=0", SCHEMA, transport=api, max_pages=5
        )


def test_single_page_no_cursor_key(spark):
    def api(url):
        return json.dumps({"items": [{"item_id": 7, "val": 8}]})  # no "next"

    df = fetch_json_paginated(spark, "fake://one?page=0", SCHEMA, transport=api)
    assert [(r["item_id"], r["val"]) for r in df.collect()] == [(7, 8)]


def test_observe_metrics_match_groundtruth(spark, sf_dir):
    """df.observe() is the zero-cost monitoring hook: metrics ride the
    existing job, no second scan. They must agree with a direct agg."""
    from pyspark.sql import Observation

    from etl_caic_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    ).first()
    assert got["n_rows"] == direct["n_rows"]
    assert got["sum_cents"] == direct["sum_cents"]
    assert got["n_finished"] == direct["n_finished"]
