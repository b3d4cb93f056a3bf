"""Focused scale probe for the round-14 wave19a queries plus the r13
verdict's re-probe asks. Expected laws:

- dedup_gram50_exact: gram explode -> md5 -> df window -> doc agg; two
  linear shuffles, no pair enumeration — linear in tokens.
- quality_fasttext_linear: zero-shuffle per-row expression chain —
  linear, and the per-factor cost should be almost pure scan+lambda.
- eval_crossmodal_recall: FIXED query set (vec_id < cap) x linear image
  tower — linear.
- eval_reward_margin: per-row scorer + two broadcast joins at group
  grain — linear.
- text_decontaminate_ngrams (r13 verdict ask #6 re-probe): with the
  r14 absolute eval cap (doc_id < 2000), replicas (ids shifted by
  10M) can NEVER join the eval split, so the probe now measures the
  production posture directly — frozen eval side, replicated train
  corpus. Expected law: linear (the r13 5.3x-at-100x reading was the
  probe's eval-side replication artifact, now structurally excluded).
- eval_lsh_threshold_sweep (r13 verdict ask #3 100x row): the truth
  leg now carries the stop-shingle df-cap (df <= 20), bounding every
  bucket at df^2 pairs; replicas rotate the alphabet so per-shingle
  df stays ~constant — expected linear, where the uncapped r13 shape
  was quadratic-per-bucket (52.8 s at 30x, no 100x row taken).
- eval_quantized_recall / eval_contamination_report: fixed query/eval
  sets (caps) x linear corpus — linear.

Usage: python tools/scale_probe_wave19.py [factors...] (default 1 10 30 100)
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
    "dedup_gram50_exact",
    "quality_fasttext_linear",
    "eval_crossmodal_recall",
    "eval_reward_margin",
    "text_decontaminate_ngrams",
    "eval_lsh_threshold_sweep",
    "eval_quantized_recall",
    "eval_contamination_report",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-w19", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w19_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            for name, idc, shift in (
                ("documents", "doc_id", 10_000_000),
                ("embeddings", "vec_id", 10_000_000),
            ):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, shift).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor}
        for q in QUERIES:
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
