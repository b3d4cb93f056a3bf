"""Spatial queries (round 5): grid-binned epsilon-neighbor join over the
embedding table's first two dimensions — the metric-space sibling of the
LSH band-join, oracled against a DuckDB all-pairs join (feasible at
sf=0.01's 500 points; the grid plan is the one that survives 100 TB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.operators.geo import grid_neighbor_pairs
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_EPS = 0.03


@register(
    "geo_grid_join",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           greatest(abs(a.x - b.x), abs(a.y - b.y)) AS d_inf
    FROM p a JOIN p b
      ON a.vec_id < b.vec_id
     AND abs(a.x - b.x) <= {_EPS}
     AND abs(a.y - b.y) <= {_EPS}
    """,
    tags=("geo", "join", "scale"),
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-neighbor spatial self-join via grid binning
    (operators/geo.py): snap to eps-cells, probe the 3x3 neighborhood
    through a 9x explode on one side, equi-join on cell ids, verify the
    exact L∞ predicate. The oracle is the quadratic all-pairs join —
    same rows, a plan that would NOT survive scale; the registered Spark
    plan shuffles on cell keys and is linear in points x density.

    Distances stay exact (per-row double arithmetic on float-origin
    values is bit-identical across engines), so the query hash-matches
    without rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    return grid_neighbor_pairs(pts, "vec_id", "x", "y", _EPS)
