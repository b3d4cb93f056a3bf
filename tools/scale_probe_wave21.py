"""Focused scale probe for the round-15 wave21a queries. Expected laws:

- quality_ensemble_gate: two zero-exchange scorer legs + the Gopher
  leg's one token-grain explode + doc-grain joins — linear.
- eval_semdedup_agreement: the sum of its two audited pipelines —
  dedup_semantic_embedding (SRP-LSH banding with the 512 bucket cap;
  replica-identical embeddings flood buckets, the cap holds) and
  dedup_semdedup_prune (capped-cluster path at replica factors) —
  linear once both fuses engage.
- data_rho_selection: one scan, one source-grain window — linear.

Usage: python tools/scale_probe_wave21.py [factors...] (default 1 10 30 100)
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
    "quality_ensemble_gate",
    "eval_semdedup_agreement",
    "data_rho_selection",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-w21", cpus=32)
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
