"""Flagship pipeline query registration (milestone M3).

caic_pipeline runs on in-code deterministic fixtures (FIXTURES.md Part B —
the driver's sf dirs carry no CAIC-shaped tables), so the driver records a
rows-only check; the exact semantics are pinned by the golden test
(tests/test_caic_golden.py) per SURVEY.md §5.2.2."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_caic_spark.operators.caic import caic_pipeline
from etl_caic_spark.registry import register
from etl_caic_spark.sources.caic_fixtures import generate_areas, generate_forecasts


@register("caic_pipeline", oracle=None, tags=("flagship",))
def caic_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference dataflow R1→R14 over deterministic CAIC-shaped
    fixtures (sf_dir unused — no CAIC tables in the driver's testdata)."""
    areas = generate_areas(spark, n=60, seed=42)
    forecasts = generate_forecasts(spark, n_areas=60, per_area=2.0, seed=43)
    return caic_pipeline(areas, forecasts)
