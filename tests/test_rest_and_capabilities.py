"""REST snapshot source (fail-fast semantics, injectable transport —
reference task.ts:88-107) and the capabilities introspection surface
(reference R17)."""

from __future__ import annotations

import json

import pytest

from etl_caic_spark.capabilities import capabilities, explain_query
from etl_caic_spark.schemas import AREAS_SCHEMA, FORECASTS_SCHEMA
from etl_caic_spark.sources.rest import fetch_json_snapshot, snapshot_url, utcnow_iso


def test_snapshot_url_encodes_params():
    url = snapshot_url(
        "https://example.test/products/all",
        {"datetime": "2026-02-01T10:00:00.000Z", "includeExpired": "false"},
    )
    assert "datetime=2026-02-01T10%3A00%3A00.000Z" in url
    assert url.startswith("https://example.test/products/all?")
    assert "T" in utcnow_iso() and utcnow_iso().endswith("Z")


def test_fetch_feature_collection_shape(spark):
    payload = {
        "type": "FeatureCollection",
        "features": [
            {
                "area_id": "A1",
                "_pos": 0,
                "geometry_type": "Polygon",
                "geometry_json": '{"type":"Polygon","coordinates":[]}',
                "properties_json": None,
            }
        ],
    }
    df = fetch_json_snapshot(
        spark,
        "https://example.test/areas",
        AREAS_SCHEMA,
        record_path="features",
        transport=lambda url: json.dumps(payload),
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["area_id"] == "A1"


def test_fetch_fails_fast_on_bad_payload(spark):
    with pytest.raises(ValueError):
        fetch_json_snapshot(
            spark,
            "https://example.test/areas",
            FORECASTS_SCHEMA,
            record_path="features",
            transport=lambda url: json.dumps({"features": "not-an-array"}),
        )


def test_fetch_fails_fast_on_transport_error(spark):
    def boom(url):
        raise RuntimeError("non-2xx from upstream")

    with pytest.raises(RuntimeError):
        fetch_json_snapshot(spark, "https://x", AREAS_SCHEMA, transport=boom)


def test_capabilities_catalog():
    cat = capabilities()
    assert len(cat) > 90
    assert cat["agg_groupby_q1"]["oracle_checked"]
    assert not cat["dedup_minhash"]["oracle_checked"]
    assert all(v["doc"] for v in cat.values()), "every query is documented"


def test_explain_debug_toggle(spark, sf_dir):
    plan = explain_query(spark, sf_dir, "agg_groupby_q1")
    assert "HashAggregate" in plan and "PushedFilters" in plan
