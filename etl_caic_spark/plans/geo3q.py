"""Wave 26c (round 5): web-map tile aggregation — quadkey encoding by
bit interleaving and a two-zoom tile pyramid rollup, the shape a tile
server / heatmap backend computes over a point table. Points are the
same quantized embedding coordinates as geo_point_in_polygon, so both
engines derive identical integer tiles; the quadkey digits are pure
shift/mask arithmetic (layout_zorder's interleave, spelled as Bing-maps
base-4 digits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_ZOOM = 6  # 64x64 tiles at the deepest level


def _digit(tx: Column, ty: Column, k: int) -> Column:
    return (
        F.shiftright(tx, k).bitwiseAND(F.lit(1))
        + F.shiftright(ty, k).bitwiseAND(F.lit(1)) * 2
    ).cast("string")


@register(
    "geo_quadkey_rollup",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id,
             ((CAST(round(CAST(embedding[1] AS DOUBLE) * 12000) AS BIGINT)
               % 64) + 64) % 64 AS tx,
             ((CAST(round(CAST(embedding[2] AS DOUBLE) * 12000) AS BIGINT)
               % 64) + 64) % 64 AS ty
      FROM embeddings
    ),
    keyed AS (
      SELECT vec_id,
             {" || ".join(
                 f"CAST(((tx >> {k}) & 1) + 2 * ((ty >> {k}) & 1) AS VARCHAR)"
                 for k in range(_ZOOM - 1, -1, -1)
             )} AS qk
      FROM pts
    ),
    z6 AS (
      SELECT 6 AS zoom, qk AS tile, CAST(count(*) AS BIGINT) AS n,
             CAST(min(vec_id) AS BIGINT) AS min_vec
      FROM keyed GROUP BY 2
    ),
    z4 AS (
      SELECT 4 AS zoom, substr(qk, 1, 4) AS tile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(vec_id) AS BIGINT) AS min_vec
      FROM keyed GROUP BY 2
    )
    SELECT CAST(zoom AS INT) AS zoom, tile, n, min_vec FROM z6
    UNION ALL
    SELECT CAST(zoom AS INT) AS zoom, tile, n, min_vec FROM z4
    """,
    tags=("geo", "agg"),
)
def geo_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-pyramid aggregation: integer point coordinates are wrapped
    onto a 64×64 zoom-6 grid, each point's Bing-maps QUADKEY is built
    by interleaving the tile bits as base-4 digits (msb first — each
    digit picks the child quadrant, so a PREFIX of a quadkey IS the
    parent tile), and point counts are rolled up at zoom 6 and, via
    prefix truncation, zoom 4. This prefix-containment property is why
    tile servers key on quadkeys: parent aggregation is substr(), not
    geometry math.

    Scale: per-point key construction is shift/mask codegen (no UDF);
    each zoom is one map-side-combinable groupBy on a bounded key
    space (≤4^zoom tiles). At 100 TB you'd compute the deepest zoom
    once and cascade parents from the CHILD AGGREGATE (64× smaller),
    not the raw points — the rollup_timeseries grain-cascade pattern
    applied to space."""
    e = load_table(spark, sf_dir, "embeddings")
    tx = (
        (F.round(F.col("embedding")[0].cast("double") * 12000).cast("bigint") % 64 + 64)
        % 64
    )
    ty = (
        (F.round(F.col("embedding")[1].cast("double") * 12000).cast("bigint") % 64 + 64)
        % 64
    )
    keyed = e.select(
        "vec_id",
        F.concat(
            *[_digit(tx, ty, k) for k in range(_ZOOM - 1, -1, -1)]
        ).alias("qk"),
    )
    z6 = keyed.groupBy(F.col("qk").alias("tile")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("vec_id").cast("bigint").alias("min_vec"),
    ).select(F.lit(6).cast("int").alias("zoom"), "tile", "n", "min_vec")
    z4 = keyed.groupBy(F.substring("qk", 1, 4).alias("tile")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("vec_id").cast("bigint").alias("min_vec"),
    ).select(F.lit(4).cast("int").alias("zoom"), "tile", "n", "min_vec")
    return z6.unionByName(z4)
