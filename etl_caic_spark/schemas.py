"""Schema registry (SURVEY.md §1): Spark StructTypes mirroring the
reference's TypeBox schemas — strict envelope, lenient payload.

Geometry is carried as (geometry_type, geometry_json) string columns
(SURVEY.md §1.4): GeoJSON coordinate nesting is ragged across geometry
kinds, so the JSON text is the portable representation and coordinates are
parsed with from_json against the depth implied by geometry_type."""

from __future__ import annotations

from pyspark.sql import types as T

# areas — one row per Feature of the area FeatureCollection
# (reference task.ts:8-16; fixture spec FIXTURES.md Part B).
AREAS_SCHEMA = T.StructType(
    [
        T.StructField("area_id", T.StringType(), False),
        T.StructField("_pos", T.IntegerType(), False),  # source-collection position
        T.StructField("geometry_type", T.StringType(), False),
        T.StructField("geometry_json", T.StringType(), False),
        T.StructField("properties_json", T.StringType(), True),
    ]
)

# forecasts — mirrors AvalancheForecastSchema (reference task.ts:18-43).
SUMMARY_DAY = T.StructType(
    [
        T.StructField("date", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
RATING_DAY = T.StructType(
    [
        T.StructField("alp", T.StringType(), True),
        T.StructField("tln", T.StringType(), True),
        T.StructField("btl", T.StringType(), True),
    ]
)
FORECASTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("area_id", T.StringType(), False),
        T.StructField("public_name", T.StringType(), True),
        T.StructField("forecaster", T.StringType(), True),
        T.StructField("issue_date_time", T.StringType(), True),  # ISO-8601 string,
        T.StructField("expiry_date_time", T.StringType(), True),  # as in task.ts:71
        T.StructField("is_translated", T.BooleanType(), True),
        T.StructField("summary_days", T.ArrayType(SUMMARY_DAY), True),
        T.StructField("rating_days", T.ArrayType(RATING_DAY), True),
    ]
)

# Coordinate depths per geometry kind, for from_json of geometry_json.
POLYGON_COORDS = "array<array<array<double>>>"
MULTIPOLYGON_COORDS = "array<array<array<array<double>>>>"
LINESTRING_COORDS = "array<array<double>>"
MULTILINESTRING_COORDS = "array<array<array<double>>>"
POINT_COORDS = "array<double>"
MULTIPOINT_COORDS = "array<array<double>>"
