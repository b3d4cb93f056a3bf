"""Focused scale probe for the round-13 wave18a queries (probe-before-
ship discipline). Expected laws:

- text_decontaminate_ngrams: one corpus shingle explode + broadcast
  eval-index probe — linear in tokens; the eval split replicates with
  the corpus, so broadcast bytes grow linearly too (watch the 30x
  broadcast size, still MBs here).
- eval_lsh_threshold_sweep: one signature pass (linear) + three banded
  self-joins (bucket-bounded) + the exact-truth inverted-index join —
  the truth leg is the quadratic-per-bucket audit leg, same law as
  eval_minhash_quality.
- text_bpe_encode: vocab learning is top-200-bounded after one word
  count; encoding is one word explode + codegen replaces — linear.
- eval_quantized_recall: query side grows with replication, so the
  broadcast-join pair count grows ~quadratically BY DESIGN at this
  probe (corpus x corpus/25) — the audit is run on a bounded query
  sample in production; the law to check is pairs/sec staying flat.

Usage: python tools/scale_probe_wave18.py [factors...] (default 1 10 30)
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
    spark = get_spark(app_name="scale-probe-w18", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w18_sf_x{factor}")
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
        for q in (
            "text_decontaminate_ngrams",
            "eval_lsh_threshold_sweep",
            "text_bpe_encode",
            "eval_quantized_recall",
            "corpus_tokenize_pack_shard",
            "eval_contamination_report",
            "text_tokenizer_parity",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
