"""Wave 30 (round 5): experiment analysis and distributed linear
algebra — the deterministic-assignment A/B test readout (the analytics
query every experimentation platform materializes) and the Gram/scatter
matrix over an embedding column (the precursor to PCA/whitening, and
the canonical 'partial outer-product aggregation' shape in distributed
ML).

Exactness: A/B assignment is md5-banded (reproducible, the
train_test_split convention); conversion counts are BIGINT and the
z-statistic is built from single divisions with identical expression
trees. The Gram matrix is computed on micro-unit QUANTIZED features, so
every entry is an exact int64 sum — no float accumulation anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "eval_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 4)
                       < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) % 100 < 40
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1, 2
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM assigned GROUP BY 1
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 'treatment' THEN n END) AS nt,
        max(CASE WHEN arm = 'treatment' THEN conv END) AS ct,
        max(CASE WHEN arm = 'control' THEN n END) AS nc,
        max(CASE WHEN arm = 'control' THEN conv END) AS cc
      FROM arms
    )
    SELECT CAST(nt AS BIGINT) AS n_treatment, CAST(ct AS BIGINT) AS conv_treatment,
           CAST(nc AS BIGINT) AS n_control, CAST(cc AS BIGINT) AS conv_control,
           round(ct * 1.0 / nt, 6) AS rate_treatment,
           round(cc * 1.0 / nc, 6) AS rate_control,
           round(ct * 1.0 / nt - cc * 1.0 / nc, 6) AS lift,
           round((ct * 1.0 / nt - cc * 1.0 / nc)
                 / sqrt(((ct + cc) * 1.0 / (nt + nc))
                        * (1.0 - (ct + cc) * 1.0 / (nt + nc))
                        * (1.0 / nt + 1.0 / nc)), 6) AS z_stat
    FROM wide
    """,
    tags=("ml", "eval", "agg"),
)
def eval_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test readout with DETERMINISTIC assignment:
    users are bucketed 50/50 by md5('exp1:'+user_id) band (the
    reproducible assignment every experimentation platform uses — the
    same user always lands in the same arm, on any engine), a
    deterministic synthetic label derived from the user's purchase
    total stands in for conversion (a max-over-events outcome saturates
    to 100% as events accumulate — the degenerate-variance case the
    pooled z divides by zero on, found the hard way under ANSI mode),
    and the two-proportion z-statistic
    under the pooled-rate null is computed from four BIGINT-exact
    counts with single divisions. One row out: rates, lift, z.

    Scale: one user-keyed aggregate (map-side combinable) then a
    4-number reduction — the experiment readout costs one shuffle
    regardless of event volume. Assignment-by-hash also means the
    query IS the assignment service: no membership table to join."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                4,
            )
            < "8000",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
    ).agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            % 100
            < 40,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("conv"))).alias("ct"),
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("arm") == "control", F.col("conv"))).alias("cc"),
    )
    nt, ct = F.col("nt"), F.col("ct")
    nc, cc = F.col("nc"), F.col("cc")
    pooled = (ct + cc) * 1.0 / (nt + nc)
    return wide.select(
        nt.cast("bigint").alias("n_treatment"),
        ct.cast("bigint").alias("conv_treatment"),
        nc.cast("bigint").alias("n_control"),
        cc.cast("bigint").alias("conv_control"),
        F.round(ct * 1.0 / nt, 6).alias("rate_treatment"),
        F.round(cc * 1.0 / nc, 6).alias("rate_control"),
        F.round(ct * 1.0 / nt - cc * 1.0 / nc, 6).alias("lift"),
        F.round(
            (ct * 1.0 / nt - cc * 1.0 / nc)
            / F.sqrt(pooled * (1.0 - pooled) * (1.0 / nt + 1.0 / nc)),
            6,
        ).alias("z_stat"),
    )


_GRAM_OUT = "i int, j int, dot bigint"
_GDIM = 16  # leading coordinates — 16x16 upper triangle = 136 entries


def _gram_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)[:, :_GDIM]
        q = np.round(emb * 1000).astype(np.int64)  # milli-unit features
        g = q.T @ q  # (16,16) partial Gram — one matmul per batch
        iu = np.triu_indices(_GDIM)
        yield pd.DataFrame(
            {
                "i": iu[0].astype("int32") + 1,
                "j": iu[1].astype("int32") + 1,
                "dot": g[iu],
            }
        )


@register(
    "embed_gram_matrix",
    oracle=f"""
    SELECT CAST(gi.i AS INT) AS i, CAST(gj.j AS INT) AS j,
           CAST(sum(CAST(round(CAST(embedding[gi.i] AS DOUBLE) * 1000)
                         AS BIGINT)
                    * CAST(round(CAST(embedding[gj.j] AS DOUBLE) * 1000)
                           AS BIGINT)) AS BIGINT) AS dot
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, {_GDIM})) AS i) gi,
         LATERAL (SELECT unnest(generate_series(1, {_GDIM})) AS j) gj
    WHERE gj.j >= gi.i
    GROUP BY 1, 2
    """,
    tags=("ml", "udf", "linalg"),
)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram (scatter) matrix XᵀX over the leading {_GDIM}
    embedding coordinates — the PCA / whitening / ridge-regression
    precursor, and the canonical PARTIAL OUTER-PRODUCT aggregation:
    each Arrow batch contributes one small (d×d) matmul inside
    mapInPandas, the per-batch partials explode to (i, j, dot) upper-
    triangle entries, and a final groupBy sums them — the map-side
    combine carries d² numbers per batch, never the data. Features are
    quantized to milli-units so every entry is an exact int64 sum and
    the oracle replays it per-coordinate-pair.

    Scale: THE pattern for tall-skinny linear algebra at 100 TB — the
    shuffle is O(batches·d²), independent of row count; the d×d result
    fits anywhere and the eigen-solve happens on the driver (a few
    microseconds for d=64). Row-wise explode-join approaches shuffle
    O(rows·d²) and die; this shape is why."""
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    partials = e.mapInPandas(_gram_batches, _GRAM_OUT)
    return partials.groupBy("i", "j").agg(
        F.sum("dot").cast("bigint").alias("dot")
    )
