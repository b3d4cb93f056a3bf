"""Focused scale probe for the round-15 wave20a queries plus the
re-shaped eval_minhash_quality (r14 verdict ask #2). Expected laws:

- dedup_semdedup_prune: centroid training + zero-exchange assignment are
  linear; the within-cluster pair stage is quadratic in cluster depth BY
  DESIGN (SemDeDup's cost model — production scales the centroid count k
  with the corpus). Replicated fixtures pile identical embeddings into
  the same 10 label-clusters, so clusters cross the _SD_CAP fuse at
  factor >= ~4 and the probe measures the capped path (pairs skipped,
  cluster_capped=true rows) — the fuse engaging IS the posture under
  replica pathology; the uncapped regime needs k to grow, which the
  fixture's frozen label space cannot express.
- text_langid_chargram: zero-exchange per-row chain — linear, pure
  scan+lambda (the quality_fasttext_linear law at char grain).
- data_doremi_reweight: one map-side-combined aggregate at source grain
  + windows over a 20-row frame — linear in the scan.
- dedup_ensemble_agreement: four corpus-linear dedup legs (replicas get
  perturbed texts, so shingle/gram dfs stay ~constant) + doc-grain
  joins — linear.
- eval_minhash_quality (re-shaped): candidate leg banded-linear; the
  exact-truth leg now runs on the deterministic 50% md5-band stratum,
  still quadratic-per-shingle-bucket WITHIN the stratum but on 1/4 the
  pairs; replicas rotate texts so per-shingle df stays ~constant —
  expected ~linear, at ~1/4 the truth-leg constant of the r14 shape.

Usage: python tools/scale_probe_wave20.py [factors...] (default 1 10 30 100)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from etl_caic_spark.plans import REGISTRY  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402
from etl_caic_spark.util import scratch_path  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timeit  # noqa: E402

QUERIES = (
    "dedup_semdedup_prune",
    "text_langid_chargram",
    "data_doremi_reweight",
    "dedup_ensemble_agreement",
    "eval_minhash_quality",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-w20", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w19_sf_x{factor}")  # shared replica cache
            os.makedirs(sfdir, exist_ok=True)
            for name, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, 10_000_000).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor, "load1": round(os.getloadavg()[0], 2)}
        for q in QUERIES:
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
