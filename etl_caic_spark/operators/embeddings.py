"""Embedding-column preparation operators (north star: similarity search
over array<float> columns): L2 normalization and symmetric int8
quantization — the storage/compute halvers applied before ANN indexing at
scale. All math is JVM-side transform/aggregate in double; per-vector
scalars are staged as real columns before any HOF references them (HOF
re-evaluation trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def normalize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Unit-L2 vectors: each component divided by the vector norm (rounded
    so any engine reproduces the doubles). Zero vectors pass through as
    zeros via the norm>0 guard."""
    staged = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    return staged.select(
        id_col,
        F.round("_norm", decimals).alias("norm"),
        F.transform(
            "_v",
            lambda x: F.when(
                F.col("_norm") > 0, F.round(x / F.col("_norm"), decimals)
            ).otherwise(F.lit(0.0)),
        ).alias("unit_vec"),
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Symmetric int8 quantization: scale = 127 / max(|x|) per vector,
    q_i = round(x_i * scale) stored as array<tinyint> — the actual 4x
    storage reduction, SIMD-friendly; dequantize as q / scale. Integer
    rounding of an exact double product is engine-portable (both round
    half away from zero); |q| <= 127 always fits tinyint."""
    staged = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn(
        "_maxabs",
        F.aggregate(
            F.col("_v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        ),
    )
    scale = F.when(F.col("_maxabs") > 0, F.lit(127.0) / F.col("_maxabs")).otherwise(
        F.lit(0.0)
    )
    staged = staged.withColumn("_scale", scale)
    return staged.select(
        id_col,
        F.round("_scale", decimals).alias("scale"),
        F.transform(
            "_v", lambda x: F.round(x * F.col("_scale"), 0).cast("tinyint")
        ).alias("qvec"),
    )
