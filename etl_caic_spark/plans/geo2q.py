"""Wave 16 (round 5): exact point-in-polygon containment and cohort
retention — the geometry primitive the reference's domain actually runs
on (CAIC forecast areas are GeoJSON polygons; point-in-area is the
canonical downstream query over its output, reference task.ts:148-186
emits the polygons), and the classic product-analytics rollup.

Point-in-polygon is done with PURE INTEGER ray casting (cross-multiplied
comparisons — no division, no floats), so containment is exact and the
oracle is the same arithmetic in SQL. Deterministic polygons are derived
from the region table; points from quantized embedding coordinates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# Deterministic 8-gon per region: center spread on a coarse grid, radii
# varying per vertex so polygons are non-convex (star-like) — exercises
# the general ray-cast, not just convex containment. Integer coords.
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
    "geo_point_in_polygon",
    oracle=f"""
    WITH poly AS ({_POLY_SQL}),
    edges AS (
      SELECT a.poly_id, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
      FROM poly a JOIN poly b
        ON a.poly_id = b.poly_id AND b.vid = (a.vid + 1) % 8
    ),
    pts AS (
      SELECT vec_id AS point_id,
             CAST(round(CAST(embedding[1] AS DOUBLE) * 12000) AS BIGINT) AS px,
             CAST(round(CAST(embedding[2] AS DOUBLE) * 4000) AS BIGINT) AS py
      FROM embeddings
    ),
    crossings AS (
      SELECT point_id, poly_id, count(*) AS n_cross
      FROM pts JOIN edges
        ON ((y1 > py) <> (y2 > py))
       AND (CASE WHEN y2 > y1
                 THEN (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1)
                 ELSE (px - x1) * (y2 - y1) > (py - y1) * (x2 - x1) END)
      GROUP BY 1, 2
    )
    SELECT poly_id, CAST(count(*) AS BIGINT) AS n_inside,
           CAST(min(point_id) AS BIGINT) AS first_point,
           CAST(max(point_id) AS BIGINT) AS last_point
    FROM crossings WHERE n_cross % 2 = 1
    GROUP BY 1
    """,
    tags=("geo", "join"),
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon containment by integer ray casting: a
    horizontal ray from each point crosses polygon edges an odd number
    of times iff the point is inside. The crossing test is done with
    CROSS-MULTIPLIED integer comparisons ((px−x1)(y2−y1) vs
    (py−y1)(x2−x1), sign-flipped by edge direction) — no division, no
    floats, so the result is bit-exact and the star-shaped (non-convex)
    test polygons are handled correctly. This is the containment
    primitive under the reference's own domain: CAIC emits forecast-area
    polygons (task.ts:148-186) and 'which stations/tracks fall in which
    area' is the canonical downstream join. Plan shape: polygons explode
    to 8 edges and BROADCAST (dimension-sized); points stream through a
    single scan against the broadcast edge list, and the parity check is
    one map-side-combinable count — the same shape at 100 TB, where the
    polygon side stays tiny and the point side never shuffles."""
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
        F.col("poly_id").alias("pa"), "vid",
        F.col("vx").alias("x1"), F.col("vy").alias("y1"),
    )
    b = poly.select(
        F.col("poly_id").alias("pb"), F.col("vid").alias("vid2"),
        F.col("vx").alias("x2"), F.col("vy").alias("y2"),
    )
    edges = a.join(
        b,
        (F.col("pa") == F.col("pb")) & (F.col("vid2") == (F.col("vid") + 1) % 8),
    ).select(F.col("pa").alias("poly_id"), "x1", "y1", "x2", "y2")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("point_id"),
        F.round(F.element_at("embedding", 1).cast("double") * 12000)
        .cast("bigint")
        .alias("px"),
        F.round(F.element_at("embedding", 2).cast("double") * 4000)
        .cast("bigint")
        .alias("py"),
    )
    straddles = (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    lhs = (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
    crosses = F.when(F.col("y2") > F.col("y1"), lhs < rhs).otherwise(lhs > rhs)
    crossings = (
        pts.join(F.broadcast(edges), straddles & crosses)
        .groupBy("point_id", "poly_id")
        .agg(F.count("*").alias("n_cross"))
    )
    return (
        crossings.filter(F.col("n_cross") % 2 == 1)
        .groupBy("poly_id")
        .agg(
            F.count("*").alias("n_inside"),
            F.min("point_id").alias("first_point"),
            F.max("point_id").alias("last_point"),
        )
    )


@register(
    "ts_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS act_day
      FROM events
    ),
    sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY 1
    ),
    cells AS (
      SELECT f.cohort_day,
             CAST(datediff('day', f.cohort_day, a.act_day) AS INT)
               AS days_since,
             CAST(count(*) AS BIGINT) AS n_active
      FROM firsts f JOIN activity a USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cohort_day, days_since, n_active, cohort_size,
           round(n_active * 1.0 / cohort_size, 4) AS retention
    FROM cells JOIN sizes USING (cohort_day)
    """,
    tags=("timeseries", "agg"),
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users are
    cohorted by the DAY of their FIRST event (the fixture spans one
    month, so daily cohorts give a full matrix; at calendar scale swap
    day for month — same plan); each (cohort, days since) cell counts
    users still active that day, normalized by
    cohort size. Three aggregates chained on user_id/month keys: the
    first-event min and the distinct activity months share the user_id
    shuffle (AQE reuses the partitioning for the join), the cell rollup
    is map-side combinable, and cohort sizes broadcast back onto the
    tiny matrix. No window functions at all — at 100 TB the cost is two
    passes over (user_id, month), both narrow. The months_since
    dimension is computed with calendar month arithmetic (months_between
    on truncated months is integral by construction)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("act_day")
    ).distinct()
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    cells = (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("act_day"), F.col("cohort_day"))
            .cast("int")
            .alias("days_since"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "days_since",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT nullif(user_id % 50, 13) AS lkey,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    dim AS (
      SELECT DISTINCT nullif(o_custkey % 50, 13) AS rkey,
             'b' || CAST(coalesce(nullif(o_custkey % 50, 13), -1) AS VARCHAR)
               AS bucket_label
      FROM orders
    )
    SELECT bucket_label, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM l JOIN dim ON lkey IS NOT DISTINCT FROM rkey
    GROUP BY 1
    """,
    tags=("join",),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): bucket 13
    is nulled on BOTH sides, and the null-safe predicate matches the
    NULL fact rows to the NULL dimension row — a plain equi-join would
    silently drop them (NULL = NULL is NULL), which is the classic
    silent-data-loss bug in dimension joins with 'unknown' members.
    Spark plans <=> as a hash join on a null-tolerant key (NOT a
    cartesian residual), so the 100 TB cost is identical to the plain
    join; the dimension broadcasts. Completes the join-variant surface
    (inner/outer/semi/anti/cross/range/asof/interval/bucketed/salted/
    bloom/shuffle-hash + null-safe)."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    left = ev.select(
        F.nullif(F.col("user_id") % 50, F.lit(13)).alias("lkey"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    dim = (
        o.select(F.nullif(F.col("o_custkey") % 50, F.lit(13)).alias("rkey"))
        .distinct()
        .select(
            "rkey",
            F.concat(
                F.lit("b"),
                F.coalesce(F.col("rkey"), F.lit(-1)).cast("string"),
            ).alias("bucket_label"),
        )
    )
    return (
        left.join(F.broadcast(dim), F.col("lkey").eqNullSafe(F.col("rkey")))
        .groupBy("bucket_label")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
