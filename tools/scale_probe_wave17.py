"""Focused scale probe for the round-12 wave17a queries (probe-before-
ship discipline). None is iterative; expected laws:

- eval_span_f1: corruption/label explode + two bounded island windows
  (per-doc partitions, <= 24 rows each) + one doc-grain full outer
  join — linear in docs.
- eval_distinct_ngrams: one doc scan exploding uni+bigrams into a
  (source, gram)-grain conditional aggregate — linear in tokens,
  vocabulary-grain reducers (fixture vocab is fixed, so constant
  after the scan).
- stat_mcnemar: one fact scan, pure scalar codegen, one-row reduce —
  linear, map-side combined.
- stat_runs_test / ts_sax_symbolize: fact groupBy to the bounded
  daily grid — linear scan term; median rank / lag / ntile windows
  are constant (grid is date-span capped).
- priv_dp_quantile: fact groupBy to the value-domain-bounded
  (grp, bin) grain — linear scan term, constant scoring/argmax.

Usage: python tools/scale_probe_wave17.py [factors...] (default 1 10 30)
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
    spark = get_spark(app_name="scale-probe-w17", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w17_sf_x{factor}")
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
            "eval_span_f1",
            "eval_distinct_ngrams",
            "stat_mcnemar",
            "stat_runs_test",
            "ts_sax_symbolize",
            "priv_dp_quantile",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
