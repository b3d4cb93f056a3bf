"""Focused re-measure of the basket_pairs scale row (round-5 verdict
item 3): the recorded 30x point (43.9 s) exceeded the 100x point
(33.8 s) — attributed to a sandbox scheduler stall. This probe re-times
ONLY the basket pair join at each factor, repeating each measurement
REPS times and reporting min/median so a one-off stall can't invert the
curve again.

Usage: python tools/scale_probe_basket.py [factors...]  (default 1 10 30 100)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_caic_spark.session import get_spark  # noqa: E402
from etl_caic_spark.sources import load_table  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timeit  # noqa: E402

REPS = 3


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-basket", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    part = load_table(spark, SF_DIR, "part")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for factor in factors:
        li = replicate(spark, "lineitem", factor, "l_orderkey", 100_000_000)
        items = (
            li.join(
                F.broadcast(part),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .select(
                F.col("l_orderkey").alias("okey"),
                F.col("p_brand").alias("item"),
            )
            .distinct()
        )

        def run():
            noop(
                items.select("okey", F.col("item").alias("ante"))
                .join(items.select("okey", F.col("item").alias("cons")), "okey")
                .filter(F.col("ante") < F.col("cons"))
                .groupBy("ante", "cons")
                .agg(F.count("*").alias("supp_ab"))
            )

        times = sorted(timeit(run) for _ in range(REPS))
        print(
            json.dumps(
                {
                    "factor": factor,
                    "rows_lineitem": li.count(),
                    "basket_pairs_min": times[0],
                    "basket_pairs_median": times[len(times) // 2],
                    "all": times,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
