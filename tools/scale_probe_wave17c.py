"""Focused scale probe for the round-12 wave17c queries (probe-before-
ship discipline). None is iterative; expected laws:

- stat_g_test / stat_bartlett: one fact groupBy to k*m cell / k group
  moments — linear scan term, constant after (the DECIMAL(38,0)
  sum-of-squares accumulator is exactly why bartlett survives the
  row growth: int64 would overflow at ~2e18 cents^2).
- data_oversample_minority: lang-grain groupBy — linear scan term.
- corpus_datasheet: doc-stats leg linear; vocab leg is the
  agg_heavy_hitters class (token scan, vocabulary-grain reducers —
  fixture vocab is fixed so constant after the scan).

Usage: python tools/scale_probe_wave17c.py [factors...] (default 1 10 30)
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
    spark = get_spark(app_name="scale-probe-w17c", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w17c_sf_x{factor}")
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
            "stat_g_test",
            "stat_bartlett",
            "data_oversample_minority",
            "corpus_datasheet",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
