"""Wave 36 (round 5): polygon MEASUREMENT — exact area and centroid by
the integer shoelace formula, over the same deterministic star 8-gons
as geo_point_in_polygon (the reference's forecast-area payload shape,
task.ts:148-186). Doubled area and 6A-scaled centroid moments are pure
BIGINT cross products; the reported area/centroid are single divisions
rounded at the end — the same exactness discipline as the ray-cast
containment query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# Same vertex generator as geo2q._POLY_SQL (kept verbatim so the two
# geometry queries measure the same polygons).
_POLY_SQL = """
      SELECT r_regionkey AS poly_id, k.k AS vid,
             CAST(r_regionkey * 2000 AS BIGINT)
               + CAST(round((600 + 300 * (k.k % 2))
                      * cos(2 * pi() * k.k / 8)) AS BIGINT) AS vx,
             CAST(r_regionkey * 700 AS BIGINT)
               + CAST(round((600 + 300 * (k.k % 2))
                      * sin(2 * pi() * k.k / 8)) AS BIGINT) AS vy
      FROM region,
           LATERAL (SELECT unnest(generate_series(0, 7)) AS k) k
"""


@register(
    "geo_polygon_area_centroid",
    oracle=f"""
    WITH poly AS ({_POLY_SQL}),
    edges AS (
      SELECT a.poly_id,
             a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
      FROM poly a JOIN poly b
        ON a.poly_id = b.poly_id AND b.vid = (a.vid + 1) % 8
    ),
    m AS (
      SELECT poly_id,
             CAST(sum(x1 * y2 - x2 * y1) AS BIGINT) AS twice_area,
             CAST(sum((x1 + x2) * (x1 * y2 - x2 * y1)) AS BIGINT) AS cx6a,
             CAST(sum((y1 + y2) * (x1 * y2 - x2 * y1)) AS BIGINT) AS cy6a
      FROM edges GROUP BY 1
    )
    SELECT poly_id, twice_area,
           round(abs(twice_area) / 2.0, 6) AS area,
           round(cx6a / (3.0 * twice_area), 6) AS centroid_x,
           round(cy6a / (3.0 * twice_area), 6) AS centroid_y
    FROM m
    """,
    tags=("geo", "agg"),
)
def geo_polygon_area_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact polygon area + centroid by the shoelace formula over
    integer vertices: the signed doubled area Σ(x₁y₂−x₂y₁) and the
    6A-scaled centroid moments Σ(x₁+x₂)(x₁y₂−x₂y₁) are BIGINT cross
    products — no trig, no floats until the final single divisions
    (area = |2A|/2, centroid = M/(3·2A)). The signed twice_area is
    exposed raw: its SIGN encodes vertex winding (these generators wind
    counter-clockwise, so it is positive), the property GeoJSON ring
    orientation rules care about. This is the measurement half of the
    reference's forecast-area domain — containment (ray cast) says
    which points are in an area; this says how big the area is and
    where its label anchor (centroid) goes.

    Scale: vertices explode to edges (8 per polygon) and aggregate
    map-side per polygon — dimension-sized work end-to-end; on a
    billion-polygon table it is one groupBy over 8n edge rows with
    integer math in codegen."""
    r = load_table(spark, sf_dir, "region")
    k = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("vid")
    poly = r.select(F.col("r_regionkey").alias("poly_id"), k).select(
        "poly_id",
        "vid",
        (
            (F.col("poly_id") * 2000).cast("bigint")
            + F.round(
                (600 + 300 * (F.col("vid") % 2))
                * F.cos(2 * F.lit(3.141592653589793) * F.col("vid") / 8)
            ).cast("bigint")
        ).alias("vx"),
        (
            (F.col("poly_id") * 700).cast("bigint")
            + F.round(
                (600 + 300 * (F.col("vid") % 2))
                * F.sin(2 * F.lit(3.141592653589793) * F.col("vid") / 8)
            ).cast("bigint")
        ).alias("vy"),
    )
    a = poly.select(
        "poly_id", "vid", F.col("vx").alias("x1"), F.col("vy").alias("y1")
    )
    b = poly.select(
        F.col("poly_id").alias("pb"),
        F.col("vid").alias("vidb"),
        F.col("vx").alias("x2"),
        F.col("vy").alias("y2"),
    )
    edges = a.join(
        b,
        (F.col("poly_id") == F.col("pb"))
        & (F.col("vidb") == (F.col("vid") + 1) % 8),
    )
    cross = F.col("x1") * F.col("y2") - F.col("x2") * F.col("y1")
    m = edges.groupBy("poly_id").agg(
        F.sum(cross).cast("bigint").alias("twice_area"),
        F.sum((F.col("x1") + F.col("x2")) * cross).cast("bigint").alias("cx6a"),
        F.sum((F.col("y1") + F.col("y2")) * cross).cast("bigint").alias("cy6a"),
    )
    return m.select(
        "poly_id",
        "twice_area",
        F.round(F.abs(F.col("twice_area")) / 2.0, 6).alias("area"),
        F.round(F.col("cx6a") / (3.0 * F.col("twice_area")), 6).alias(
            "centroid_x"
        ),
        F.round(F.col("cy6a") / (3.0 * F.col("twice_area")), 6).alias(
            "centroid_y"
        ),
    )
