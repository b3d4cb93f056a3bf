"""Adversarial-scale probe for the round-10 quality audits (r10 verdict
ask #5): grow k WITH the data instead of replicating a fixed-cardinality
fixture.

The r10 probes replicated rows 1x/10x/30x with label/codebook
cardinality FIXED — which can hide a broadcast frame that silently
stops being broadcast-sized when k grows the way production systems
grow it (IVF nlist ~ sqrt(n), cluster count ~ sqrt(n)). This probe
scales both together: at factor f the embedding corpus has n0*f vectors
and k0*sqrt(f) labels (so k ~ sqrt(n) exactly), by relabeling
label := vec_id % k before writing the scaled fixture.

What it records per factor:
- k_labels and the centroid frame's actual size (k x 64 doubles) — the
  thing the ask wants shown to stay broadcast-sized. At k = sqrt(n)
  the frame is ~0.5 KB per thousand labels; even n = 10^10 gives
  k = 10^5 -> ~51 MB, inside Spark's 8 GB broadcast hard cap though
  past the default 10 MB autoBroadcast threshold (the queries broadcast
  explicitly, so the plan shape survives; the SCALE.md row documents
  the executor-memory budget instead of pretending it is free).
- eval_silhouette_labels runtime: the scan is O(n*k) distance pairs =
  O(n^1.5) at k ~ sqrt(n) — the textbook cost of SIMPLIFIED silhouette
  (already k/n cheaper than the O(n^2) exact form). The probe measures
  the bend so the growth law is a recorded fact, not a docstring claim.
- eval_ivf_recall runtime: assignment is O(n*k) (same law), serving is
  O(n/k * nprobe) per query — sublinear; at 100 TB assignment runs on
  a training sample (wave14a.py documents the sampled-k-means path).
- eval_pq_recall with K (codewords/subspace) grown ~ sqrt(f) from 16:
  PQ's LUT is M*K rows BY DESIGN independent of n (16^8 effective
  centroids already exceed any corpus) — production grows M (linear in
  dim), never K ~ n. The probe still grows K adversarially via the
  module knob to show the ADC LUT/broadcast stays trivial even then.

Usage: python tools/scale_probe_audits.py [factors...] (default 1 4 16)
Prints one JSON line per factor.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_caic_spark.plans import REGISTRY  # noqa: E402
from etl_caic_spark.plans import wave10a  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402
from etl_caic_spark.util import scratch_path  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timeit  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scale-probe-audits", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    k0 = 10  # label cardinality of the base fixture
    pq_k0 = wave10a._PQ_K

    for factor in factors:
        k = int(round(k0 * math.sqrt(factor)))
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"audit_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            dst = os.path.join(sfdir, "embeddings.parquet")
            if not os.path.exists(dst):
                scaled = replicate(
                    spark, "embeddings", factor, "vec_id", 10_000_000
                ).withColumn(
                    # k ~ sqrt(n): relabel so label cardinality grows with
                    # the corpus the way production IVF/cluster counts do
                    "label",
                    (F.col("vec_id") % F.lit(k)).cast("int"),
                )
                scaled.write.mode("overwrite").parquet(dst)

        row = {
            "factor": factor,
            "k_labels": k,
            "centroid_frame_kb": round(k * 64 * 8 / 1024.0, 1),
        }
        for q in ("eval_silhouette_labels", "eval_ivf_recall"):
            row[q] = timeit(lambda: noop(REGISTRY[q].fn(spark, sfdir)))

        # PQ: grow codewords-per-subspace ~ sqrt(f) via the module knob
        # (runtime-read by the DataFrame path; the SQL oracle is not
        # involved in a perf probe). LUT rows = M * K.
        wave10a._PQ_K = int(round(pq_k0 * math.sqrt(factor)))
        try:
            row["pq_k"] = wave10a._PQ_K
            row["pq_lut_rows"] = wave10a._PQ_M * wave10a._PQ_K
            row["eval_pq_recall"] = timeit(
                lambda: noop(REGISTRY["eval_pq_recall"].fn(spark, sfdir))
            )
        finally:
            wave10a._PQ_K = pq_k0
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
