"""Wave 27 (round 5): the two per-key ML execution shapes a Spark
training-data platform runs beyond SQL analytics — Arrow-batched BATCH
INFERENCE (apply a frozen model over an embedding column inside
mapInPandas) and GROUPED MODEL TRAINING (fit one model per group inside
applyInPandas). Both are UDF-surface operators whose math is integer-
exact so the DuckDB oracle can replay them: inference uses a
quantized-int dot product (micro-unit features × integer weights);
training accumulates the same BIGINT moments as stat_linreg_group and
applies the identical division tree — the oracle is shared, proving the
grouped-map path computes exactly what the declarative path does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_INFER_OUT = "vec_id bigint, score_micro bigint, pred int"

# Frozen 'model': integer weights w_i = ((i*7) % 13) - 6 for the
# 1-indexed coordinate i — spans [-6, 6], deterministic on both engines.
_DIM = 64


def _infer_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    w = ((np.arange(1, _DIM + 1, dtype=np.int64) * 7) % 13) - 6
    for pdf in it:
        emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        q = np.round(emb * 1e6).astype(np.int64)  # micro-unit features
        scores = q @ w  # int64 matmul — one BLAS-free exact pass
        yield pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].astype("int64"),
                "score_micro": scores,
                "pred": (scores > 0).astype("int32"),
            }
        )


@register(
    "udf_batch_inference",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id,
             CAST(sum(CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1e6)
                           AS BIGINT) * ((g.i * 7) % 13 - 6)) AS BIGINT)
               AS score_micro
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, {_DIM})) AS i) g
      GROUP BY 1
    )
    SELECT vec_id, score_micro,
           CAST(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END AS INT) AS pred
    FROM scored
    """,
    tags=("ml", "udf", "inference"),
)
def udf_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference over an embedding column: a frozen linear model
    (integer weight vector) is applied inside mapInPandas — features
    quantized to micro-units, one int64 matmul per Arrow batch, a
    sign-threshold prediction. This is THE model-scoring shape at
    scale: the model rides the closure (a broadcast variable for real
    weights), Arrow moves columns in bulk, and nothing touches the
    driver. Integer math makes the score bit-exact, so the oracle can
    replay it with per-coordinate SQL — proving the Arrow batch path
    computes the same dot product.

    Scale: embarrassingly parallel; per-batch cost is one (batch×dim)
    matmul. For a real fp32 model, scores drift by summation order —
    you'd round scores to a tolerance exactly like the cosine queries
    (sim_topk_cosine) do; the quantized-int form here is also what
    int8-quantized serving actually ships."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInPandas(_infer_batches, _INFER_OUT)


_OLS_OUT = (
    "event_type string, n bigint, slope_cents double, "
    "intercept_cents double, r2 double"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    n = len(pdf)
    x = np.arange(1, n + 1, dtype=np.int64)
    y = np.round(pdf["value"].to_numpy() * 100).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    sxy = int((x * y).sum())
    syy = int((y * y).sum())
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    # Mirror SQL division semantics EXACTLY: both engines convert each
    # BIGINT operand to double BEFORE dividing (Python's exact int/int
    # would differ once a moment passes 2^53).
    slope = float(cov_n) / float(var_n)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = float(cov_n) * float(cov_n) / (float(var_n) * float(vary_n))
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [n],
            "slope_cents": [round(slope, 6)],
            "intercept_cents": [round(intercept, 6)],
            "r2": [round(r2, 6)],
        }
    )


@register(
    "udf_group_train_ols",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY 1
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept_cents,
           round(((n * sxy - sx * sy) * 1.0) * ((n * sxy - sx * sy) * 1.0)
                 / (((n * sxx - sx * sx) * 1.0) * ((n * syy - sy * sy) * 1.0)),
                 6) AS r2
    FROM m
    """,
    tags=("ml", "udf", "stats"),
)
def udf_group_train_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One model per group, trained INSIDE applyInPandas: each
    event_type's rows arrive as a pandas frame, are ordered by
    (ts, event_id), and an OLS trend is fitted from BIGINT-exact
    integer moments using the SAME division tree as the declarative
    stat_linreg_group — and the SAME DuckDB oracle, so the hash match
    proves the grouped-map training path is numerically identical to
    the SQL path (the standard correctness worry with per-group UDF
    training). This is the per-tenant / per-segment model-fitting
    shape: groupBy().applyInPandas(fit) with the model row as output.

    Scale: one shuffle on the group key; each group must fit one
    executor's pandas memory (here: ~events/5 rows) — for bigger
    groups you pre-aggregate the moments in SQL and fit from moments
    (stat_linreg_group IS that plan), or stream the group through
    mapInPandas with running sums. The in-pandas sort replaces the
    window rank, so Spark plans no window at all here."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return ev.groupBy("event_type").applyInPandas(_fit_group, _OLS_OUT)
