"""Round-10 wave D (file wave14d): simplified-silhouette clustering
audit — the quality score for the label-partition / k-means family.

Every other approximate or model-ish family now carries an in-registry
quality audit (MinHash -> eval_minhash_quality, PQ -> eval_pq_recall,
IVF -> eval_ivf_recall); the clustering family (kmeans coarse
quantizers, the label partition that IVF prunes on) had none.
``eval_silhouette_labels`` scores how well the embedding table's label
column partitions the vector space, with the SIMPLIFIED silhouette
(Hruschka et al.): per point, a = distance to OWN centroid, b =
minimum distance to any OTHER centroid,
    s = (b - a) / max(a, b)      (0 when a = b = 0),
averaged per label and overall. Simplified silhouette is the form that
scales — the classic silhouette's a/b are means over pairwise
distances (O(n^2)); against centroids it is one broadcast of k
centroid arrays onto a linear scan, the same plan shape as IVF
assignment.

Exactness: centroids are the integer fixed-point means of
sim_topk_ivf_exact (per-dim BIGINT sums of floor(x*1e6), one double
division — engine-exact); distances use the inner-product identity
|x - c|^2 = x.x - 2 x.c + c.c with the dot products computed by the
same zip_with/aggregate vs list_inner_product pair the IVF oracle
proved agrees cross-engine; each point's s freezes to integer micro
BEFORE the per-label sum (order-free), and the published mean is one
rounded division (the registry's micro-freeze discipline).

Scale shape: one broadcast k x dim centroid frame cross-joined onto
the corpus scan (k is label-cardinality-bounded), a conditional
min/max reduce per point entirely in whole-stage codegen, one
label-grain groupBy. No window, no shuffle keyed by anything but the
label.

Reference parity: the reference (task.ts:88-189) has no ML surface —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import widen_narrow_scan

_SIL_SQL = """
    WITH c AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    per_dim AS (
      SELECT label, d,
             CAST(sum(CAST(floor(e[d] * 1e6) AS BIGINT)) AS DOUBLE)
             / CAST(1000000 * count(*) AS DOUBLE) AS cval
      FROM c, generate_series(1, 64) t(d)
      GROUP BY label, d
    ),
    cent AS (
      SELECT label AS clabel, list(cval ORDER BY d) AS ce
      FROM per_dim GROUP BY label
    ),
    dists AS (
      SELECT c.vec_id, c.label, cent.clabel,
             list_inner_product(c.e, c.e)
             - 2 * list_inner_product(c.e, cent.ce)
             + list_inner_product(cent.ce, cent.ce) AS d2
      FROM c CROSS JOIN cent
    ),
    ab AS (
      SELECT vec_id, label,
             sqrt(greatest(max(CASE WHEN clabel = label THEN d2 END), 0))
               AS a,
             sqrt(greatest(min(CASE WHEN clabel <> label THEN d2 END), 0))
               AS b
      FROM dists GROUP BY 1, 2
    ),
    s AS (
      SELECT label,
             CASE WHEN greatest(a, b) > 0
                  THEN CAST(round((b - a) / greatest(a, b) * 1000000)
                       AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS s_micro
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_points,
           CAST(round(sum(s_micro) * 1.0 / count(*)) AS BIGINT)
             AS mean_silhouette_micro
    FROM s GROUP BY label
"""


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@register(
    "eval_silhouette_labels", oracle=_SIL_SQL, tags=("eval", "ml", "similarity")
)
def eval_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette of the embedding table's label
    partition against exact fixed-point centroids (module docstring).
    ~0 on this fixture — random embeddings have no cluster structure,
    which is itself the calibration: a pipeline whose silhouette audit
    reads 0 on random data and >0 on its real corpus is measuring
    something.

    Plan: broadcast k centroid arrays onto the corpus scan, inner
    products via zip_with/aggregate (JVM codegen, no UDF), conditional
    min/max per point, one label-grain groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    # widen: the single-file fixture scan is ONE partition; the centroid
    # explode and the broadcast-distance map would otherwise run 1-task
    c = widen_narrow_scan(emb).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    per_dim = (
        c.select("label", F.posexplode("e").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1e6).cast("bigint")).cast("double")
                / (F.lit(1000000) * F.count("*")).cast("double")
            ).alias("cval")
        )
    )
    cent = (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("p"))
        .select(
            F.col("label").alias("clabel"),
            F.transform("p", lambda s: s.getField("cval")).alias("ce"),
        )
    )
    d2 = (
        _dot(F.col("e"), F.col("e"))
        - 2 * _dot(F.col("e"), F.col("ce"))
        + _dot(F.col("ce"), F.col("ce"))
    )
    dists = c.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.sqrt(
            F.greatest(
                F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))),
                F.lit(0.0),
            )
        ).alias("a"),
        F.sqrt(
            F.greatest(
                F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))),
                F.lit(0.0),
            )
        ).alias("b"),
    )
    s = ab.select(
        "label",
        F.when(
            F.greatest("a", "b") > 0,
            F.round(
                (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1000000
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("s_micro"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.round(F.sum("s_micro") * 1.0 / F.count("*"))
        .cast("bigint")
        .alias("mean_silhouette_micro"),
    )
