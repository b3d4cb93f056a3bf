"""Random-hyperplane LSH (SimHash-for-cosine, Charikar STOC'02) over
embedding columns — the fully-deterministic ANN candidate generator.

Unlike the IVF path (operators/similarity.py — trained quantizer, oracled
rows-only), every step here is integer arithmetic, so a SQL oracle can
reproduce the EXACT bucket assignment:

- the vector is quantized once: q[d] = floor(x_d * 1e6) as bigint
  (floor of an exact double product — bit-identical across engines);
- hyperplane signs come from an LCG, not an RNG object:
  h(i) = (1103515245 * i + 12345) mod 2^31, sign = +1 iff h mod 2048 >= 1024
  (a high LCG bit; the low bit alternates and must not be used);
- bit_p = [ Σ_d sign(p,d) * q[d] >= 0 ]  — integer dot, no float sum;
- P bits split into bands of r bits; docs sharing any (band, value)
  bucket are candidates (same banding math as MinHash LSH: P(candidate)
  = 1 - (1 - s^r)^b for cosine similarity s mapped via 1 - θ/π).

Candidate verification is the exact cosine (similarity.cosine — double,
rounded like every other similarity output), so the final pair set is
deterministic end-to-end and hash-matchable.

Scale: signatures are one narrow pass over the corpus (no shuffle);
bucketing is a groupBy on (band, value); the verify join is an equi-join
on bucket ids — never all-pairs. Same regime as MinHash banding.

Band-width picks the random-collision budget: two UNRELATED vectors agree
on one plane's bit with p≈0.5, so a band of r bits collides with
probability ~0.5^r and the candidate count is ~bands * C(N,2) * 0.5^r.
r=4 caps the whole bucket space at 16 values per band — at 60k vectors
that is ~N^2/8 candidate pairs, measured quadratic in the scale probe
(3.8s → 52s → 205s at 1x/10x/30x). The operator defaults are therefore
the SCALE config — planes=64, band_bits=16 (4 bands x 65536 values,
random-collision rate 1.5e-5) — which the same probe measures linear.
Hyperplane LSH is a NEAR-dup detector: recall at cosine s is
1-(1-p^r)^b with p = 1 - acos(s)/pi, so 16-bit bands are useful at
s >= ~0.9; for low-threshold similarity use the IVF path instead
(operators/similarity.py). The registered `sim_lsh_cosine` query keeps
an explicit 16/4 config as the small-SF correctness anchor — its oracle
reproduces bucket assignment exactly — and documents that contrast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_caic_spark.operators.similarity import cosine, with_norm
from etl_caic_spark.util import widen_narrow_scan

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def _py_plane_sign(i: int) -> int:
    """±1 from the LCG high bit — the Python twin of the SQL oracle's
    (1103515245*i + 12345) % 2^31 % 2048 >= 1024 expression. The sign
    matrix is a compile-time constant (planes × dims entries), so it is
    precomputed here rather than re-derived per row inside the plan."""
    h = (_LCG_A * i + _LCG_C) % _LCG_M
    return 1 if h % 2048 >= 1024 else -1


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 64,
    band_bits: int = 16,
    dims: int = 64,
) -> DataFrame:
    """(id, band, band_val) bucket rows — `planes` sign bits packed into
    `planes/band_bits` band values.

    The per-row work is an integer matmul against the constant ±1 sign
    matrix — exactly the Arrow-batched-NumPy case: int64 matmul is exact
    (|q| <= 1e6 ·· dims fits comfortably), so the pandas UDF produces
    bit-identical band values to the SQL oracle's per-plane integer sums
    while running ~100× faster than an interpreted nested-HOF formulation
    (measured 4.5 s → <0.1 s for 2k × 64 dims at sf0.1). floor(x * 1e6)
    on the double-cast float is IEEE-identical across engines."""
    signs = np.array(
        [
            [_py_plane_sign(p * dims + d + 1) for d in range(dims)]
            for p in range(planes)
        ],
        dtype=np.int64,
    )
    n_bands = planes // band_bits
    weights = (1 << np.arange(band_bits, dtype=np.int64))

    @F.pandas_udf("array<bigint>")
    def band_vals(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (B, dims) float32
        q = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
        bits = (q @ signs.T >= 0).astype(np.int64)  # (B, planes)
        bv = bits.reshape(len(m), n_bands, band_bits) @ weights
        return pd.Series(list(bv))

    return widen_narrow_scan(df).select(
        F.col(id_col).alias("vid"),
        F.posexplode(band_vals(F.col(vec_col))).alias("band", "band_val"),
    )


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    planes: int = 64,
    band_bits: int = 16,
    dims: int = 64,
    sim_decimals: int = 6,
    max_bucket: int | None = 512,
) -> DataFrame:
    """LSH-candidate pairs verified by exact cosine >= threshold.

    Output (id_a < id_b, cosine) is deterministic: the bucket assignment
    is integer-exact and the verify cosine follows the engine-wide
    rounding convention.

    ``max_bucket`` is the hot-bucket guard — the LSH twin of the
    stop-shingle df cap in the Jaccard path (operators/dedup.py). On
    CLUSTERED corpora (all real embedding corpora: vectors concentrate in
    a cone, e.g. all-positive activations) many vectors share a band's
    entire sign pattern, so a few buckets hold thousands of members and
    the candidate self-join goes quadratic INSIDE them — the 100× scale
    probe measured 134M candidate pairs from 200k vectors, >99% from
    oversized buckets, where the random-collision model predicts ~1M.
    A bucket with more members than ``max_bucket`` carries ~no similarity
    signal for near-dup mining (exact/near duplicates are handled by the
    dedup tier FIRST, pipeline order as in minhash) and is dropped whole
    before the join; a true near-dup pair still collides in its other
    bands. With the cap the same probe runs linear (see SCALE.md)."""
    buckets = hyperplane_signatures(
        df, id_col, vec_col, planes, band_bits, dims
    )
    if max_bucket is not None:
        w = Window.partitionBy("band", "band_val")
        buckets = (
            buckets.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    buckets = buckets.localCheckpoint()
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )
    n = with_norm(df, vec_col).select(
        F.col(id_col).alias("vid"),
        F.col("_vec").alias("vec"),
        F.col("_norm").alias("norm"),
    )
    na = n.alias("na")
    nb = n.alias("nb")
    return (
        cand.join(na, F.col("id_a") == F.col("na.vid"))
        .join(nb, F.col("id_b") == F.col("nb.vid"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine(
                    F.col("na.vec"), F.col("na.norm"), F.col("nb.vec"), F.col("nb.norm")
                ),
                sim_decimals,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
