"""Flagship pipeline query registration (milestone M3).

Round 5: caic_pipeline is now FULLY oracled. The deterministic CAIC-shaped
fixtures (FIXTURES.md Part B) are materialized once as parquet (pyarrow,
no Spark — sources/caic_fixtures.ensure_caic_fixture_parquet), and both
engines read the SAME files: Spark runs the DataFrame pipeline
(operators/caic.py), DuckDB runs the SQL twin below expressing the
reference dataflow R6→R14 (reference task.ts:114-187) — dedup via
QUALIFY row_number, the severity ordinal and label/color dictionaries as
CASE expressions, the 7-field camelCase metadata object as exact string
construction (matching Spark's to_json field order and boolean casing),
and the conditional Multi* positional explode as unnest(range(n)) with
json_extract re-serialization. Exact-row golden semantics remain pinned by
tests/test_caic_golden.py per SURVEY.md §5.2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_caic_spark.operators.caic import caic_pipeline
from etl_caic_spark.registry import register
from etl_caic_spark.sources.caic_fixtures import ensure_caic_fixture_parquet

# Materialized at import: the driver may fetch oracle_sql() and run DuckDB
# before (or without) invoking the Spark query, so registration-time
# materialization guarantees the files exist either way. Idempotent, ~180
# rows, pyarrow-only.
_AREAS_PQ, _FORECASTS_PQ = ensure_caic_fixture_parquet()

# CASE fragments for the severity ordinal (functions/ordinal.py — unknown
# strings rank as noRating=6) and the reference's label/color dictionaries
# (task.ts:118-134).
_RANK = (
    "CASE rating_days[1].{band} WHEN 'extreme' THEN 1 WHEN 'high' THEN 2 "
    "WHEN 'considerable' THEN 3 WHEN 'moderate' THEN 4 WHEN 'low' THEN 5 "
    "ELSE 6 END"
)

_CAIC_ORACLE = f"""
WITH areas AS (
  SELECT area_id, geometry_type, geometry_json
  FROM '{_AREAS_PQ}'
  QUALIFY row_number() OVER (PARTITION BY area_id ORDER BY _pos DESC) = 1
),
fc AS (
  SELECT *
  FROM '{_FORECASTS_PQ}'
  WHERE type = 'avalancheforecast'
    AND summary_days IS NOT NULL AND len(summary_days) > 0
    AND rating_days IS NOT NULL AND len(rating_days) > 0
),
ranked AS (
  SELECT f.*, a.geometry_type, a.geometry_json,
         least({_RANK.format(band="btl")},
               {_RANK.format(band="tln")},
               {_RANK.format(band="alp")}) AS wr
  FROM fc f JOIN areas a ON f.area_id = a.area_id
),
feats AS (
  SELECT
    'caic-' || area_id AS id,
    CASE wr WHEN 1 THEN 'Extreme' WHEN 2 THEN 'High' WHEN 3 THEN 'Considerable'
            WHEN 4 THEN 'Moderate' WHEN 5 THEN 'Low' ELSE 'No Rating'
    END AS callsign,
    CASE wr WHEN 1 THEN '#221e1f' WHEN 2 THEN '#ee1d23' WHEN 3 THEN '#f8931d'
            WHEN 4 THEN '#fef102' WHEN 5 THEN '#4db748' ELSE '#ffffff'
    END AS fill,
    CAST(0.5 AS DOUBLE) AS fill_opacity,
    CASE wr WHEN 1 THEN '#221e1f' WHEN 2 THEN '#ee1d23' WHEN 3 THEN '#f8931d'
            WHEN 4 THEN '#fef102' WHEN 5 THEN '#4db748' ELSE '#ffffff'
    END AS stroke,
    CAST(0.75 AS DOUBLE) AS stroke_opacity,
    coalesce(summary_days[1].content, 'No Remarks') AS remarks,
    '{{"forecaster":"' || forecaster
      || '","issueDateTime":"' || issue_date_time
      || '","expiryDateTime":"' || expiry_date_time
      || '","isTranslated":' || CASE WHEN is_translated THEN 'true' ELSE 'false' END
      || ',"ratingAbove":"' || rating_days[1].alp
      || '","ratingNear":"' || rating_days[1].tln
      || '","ratingBelow":"' || rating_days[1].btl || '"}}' AS metadata,
    geometry_type, geometry_json
  FROM ranked
),
multi AS (
  SELECT *,
         unnest(range(CAST(json_array_length(geometry_json, '$.coordinates')
                           AS BIGINT))) AS part_idx
  FROM feats
  WHERE geometry_type IN ('MultiPolygon', 'MultiLineString', 'MultiPoint')
)
SELECT id || '-' || part_idx AS id,
       callsign, fill, fill_opacity, stroke, stroke_opacity, remarks, metadata,
       replace(geometry_type, 'Multi', '') AS geometry_type,
       '{{"type":"' || replace(geometry_type, 'Multi', '')
         || '","coordinates":'
         || CAST(json_extract(geometry_json,
                              '$.coordinates[' || part_idx || ']') AS VARCHAR)
         || '}}' AS geometry_json
FROM multi
UNION ALL
SELECT id, callsign, fill, fill_opacity, stroke, stroke_opacity, remarks,
       metadata, geometry_type, geometry_json
FROM feats
WHERE geometry_type NOT IN ('MultiPolygon', 'MultiLineString', 'MultiPoint')
"""


@register("caic_pipeline", oracle=_CAIC_ORACLE, tags=("flagship",))
def caic_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference dataflow R1→R14 over the parquet-materialized
    deterministic CAIC fixtures (sf_dir unused — no CAIC tables in the
    driver's testdata). Reading the materialized files (rather than
    createDataFrame) keeps the scan → decode → join → explode shape of the
    reference AND guarantees the oracle sees byte-identical inputs."""
    areas_path, forecasts_path = ensure_caic_fixture_parquet()
    areas = spark.read.parquet(areas_path)
    forecasts = spark.read.parquet(forecasts_path)
    return caic_pipeline(areas, forecasts)
