"""Focused scale probe for the round-12 wave17b queries (probe-before-
ship discipline). None is iterative; expected laws:

- eval_kn_perplexity: train bigram groupBy + three bounded
  re-groupings + a model-grain test join — linear in tokens (the
  model table grows with replication under alphabet rotation, same
  law as eval_perplexity_heldout).
- data_stratified_split: one doc scan + stratum-partitioned rank
  windows — linear; replicated fixtures densify strata (the
  adversarial direction for the window sort).
- priv_uniqueness_risk: one QI-grain groupBy — linear scan term,
  value-domain-bounded grain after.
- dq_column_profile: 6-way Expand + (col, value)-grain aggregate —
  linear at 6x row multiplicity, distinct-value-grain reducers.
- sample_bernoulli_hash: one map-side-combined scan — linear.
- text_burstiness: token scan -> (source, doc, term) counts ->
  (source, term) moments -> bounded top-k window — linear in tokens,
  vocab-grain after.

Usage: python tools/scale_probe_wave17b.py [factors...] (default 1 10 30)
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-w17b", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w17b_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            for name, idc, shift in (
                ("orders", "o_orderkey", 100_000_000),
                ("documents", "doc_id", 10_000_000),
                ("customer", "c_custkey", 100_000_000),
            ):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, shift).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor}
        for q in (
            "eval_kn_perplexity",
            "data_stratified_split",
            "priv_uniqueness_risk",
            "dq_column_profile",
            "sample_bernoulli_hash",
            "text_burstiness",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
