"""Focused scale probe for the round-12 wave16a queries (probe-before-
ship discipline). None is iterative; expected laws:

- eval_wer_corpus / eval_cer_corpus: corruption explode + per-doc
  groupBys + a doc-grain join — linear in docs; the per-row DP cost is
  capped by the 24-word slice.
- data_pack_bestfit: one shuffle to source grain; the sequential BFD
  inside applyInPandas is O(n_items * n_bins) per group, so replicated
  fixtures (which densify groups) are the adversarial direction.
- stat_page_hinkley / stat_mann_kendall: fact groupBy to the bounded
  daily grid — linear scan term; the windows/pair-join are constant
  (grid is date-span capped, so the 3M-pair join does NOT grow).
- agg_heavy_hitters_exact: one token scan into a vocab-grain groupBy —
  linear in tokens, constant after (fixture vocabulary is fixed).

Usage: python tools/scale_probe_wave16.py [factors...] (default 1 10 30)
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
    spark = get_spark(app_name="scale-probe-w16", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w16_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            for name, idc, shift in (
                ("orders", "o_orderkey", 100_000_000),
                ("documents", "doc_id", 10_000_000),
            ):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, shift).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor}
        for q in (
            "eval_wer_corpus",
            "eval_cer_corpus",
            "data_pack_bestfit",
            "stat_page_hinkley",
            "stat_mann_kendall",
            "agg_heavy_hitters_exact",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
