"""Quiet-window re-probe for quality_fasttext_linear (r14 verdict ask
#3): both r14 attempts ran under loadavg 8-20 and the rows were
steal-swamped. The query is linear BY CONSTRUCTION — a zero-exchange
per-row higher-order expression chain (PLANS.md r14) — but the SCALE.md
convention is a measured row, so this focused probe takes just this one
query at 1/10/30/100x with loadavg recorded per row (a row only counts
as clean if load1 stays single-digit for its duration).

Usage: python tools/scale_probe_qfl.py [factors...] (default 1 10 30 100)
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

QUERY = "quality_fasttext_linear"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-qfl", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    fn = REGISTRY[QUERY].fn

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w19_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            dst = os.path.join(sfdir, "documents.parquet")
            if not os.path.exists(dst):
                replicate(
                    spark, "documents", factor, "doc_id", 10_000_000
                ).write.mode("overwrite").parquet(dst)
        load_before = os.getloadavg()[0]
        # warm once (scan cache), then measure min-of-2: the query is a
        # single scan+project stage, so the warm floor is the signal
        noop(fn(spark, sfdir))
        t = min(timeit(lambda: noop(fn(spark, sfdir))) for _ in range(2))
        print(
            json.dumps(
                {
                    "factor": factor,
                    QUERY: t,
                    "load1_before": round(load_before, 2),
                    "load1_after": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
