"""Focused scale probe for the round-11 wave15a queries (probe-before-
ship discipline). None is iterative; expected laws:

- eval_confusion_prf: one fact groupBy to the k^2 confusion grain —
  linear in orders, constant after.
- eval_perplexity_heldout: token/bigram groupBys + a model-grain
  shuffle join — linear in tokens (alphabet-rotated replicas grow the
  model table linearly too, per tools/scale_probe.py replicate()).
- data_dpo_pairs: one groupBy at (source, lang) grain — linear scan,
  constant-grain shuffle.
- agg_mode_exact: two stacked groupBys — linear in events (replicated
  with shifted event_ids but UNshifted user_ids, so per-user groups
  densify with the factor — the adversarial direction for the
  distinct-grain first groupBy).
- ts_changepoint_cusum: fact groupBy to the bounded daily grid —
  linear scan term, constant window/argmax.

Usage: python tools/scale_probe_wave15.py [factors...] (default 1 10 30)
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
    spark = get_spark(app_name="scale-probe-w15", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w15_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            for name, idc, shift in (
                ("orders", "o_orderkey", 100_000_000),
                ("documents", "doc_id", 10_000_000),
                ("events", "event_id", 100_000_000),
            ):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, shift).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor}
        for q in (
            "eval_confusion_prf",
            "eval_perplexity_heldout",
            "data_dpo_pairs",
            "agg_mode_exact",
            "ts_changepoint_cusum",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
