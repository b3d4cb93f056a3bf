"""Scale probe for the round-6 machinery: exact selection (histogram
bisection), distributed prefix rank (range partition + boundary
offsets), the SNM W=1 gap audit, and the windowless binned KS.

Expectations if the designs hold:
- selection: near-flat — wall is dominated by a constant number of
  bounded aggregates whose output never exceeds 4096 rows; only the
  scan grows with the factor.
- global_order rank: linear — one range shuffle + partitioned windows.
- sequence_gaps_dist: linear — same range-shuffle profile.
- ks_binned: linear scan cost, constant (64-row) join/aggregate tail.

Usage: python tools/scale_probe_round6.py [factors...] (default 1 10 30 100)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_caic_spark.operators.prefix import with_global_order  # noqa: E402
from etl_caic_spark.operators.selection import kth_smallest  # noqa: E402
from etl_caic_spark.operators.snm import sorted_neighborhood_pairs  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402
from tools.scale_probe import replicate, timeit  # noqa: E402


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-round6", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for factor in factors:
        li = replicate(spark, "lineitem", factor, "l_orderkey", 100_000_000)
        cents = li.select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
            "l_orderkey",
        ).localCheckpoint()  # pin the replica so every probe reads the same input
        n = cents.count()
        out = {"factor": factor, "rows": n}
        out["selection_median"] = timeit(
            lambda: kth_smallest(cents, "c", (n + 1) // 2)
        )
        out["global_order_rank"] = timeit(
            lambda: noop(
                with_global_order(
                    cents, ["c", "l_orderkey"], rn_col="rn", num_partitions=32
                )
            )
        )
        out["sequence_gaps_dist"] = timeit(
            lambda: noop(
                sorted_neighborhood_pairs(
                    li.select(
                        F.col("l_orderkey").alias("k"),
                        F.col("l_orderkey").alias("s"),
                    ).distinct(),
                    ["k"],
                    "s",
                    w=1,
                    num_partitions=32,
                )
            )
        )
        out["ks_binned"] = timeit(
            lambda: noop(
                (
                    lambda s: (
                        lambda c: c.select(F.col("bin"), "a", "r")
                        .join(
                            F.broadcast(
                                c.select(
                                    F.col("bin").alias("hbin"),
                                    F.col("a").alias("ha"),
                                    F.col("r").alias("hr"),
                                )
                            ),
                            F.col("hbin") <= F.col("bin"),
                        )
                        .groupBy("bin")
                        .agg(
                            F.sum("ha").alias("c1"), F.sum("hr").alias("c2")
                        )
                    )(
                        s.groupBy("bin").agg(
                            F.sum("in_a").alias("a"), F.sum("in_r").alias("r")
                        )
                    )
                )(
                    li.filter(F.col("l_returnflag").isin("A", "R")).select(
                        F.least(
                            F.floor(F.col("l_quantity")).cast("bigint"),
                            F.lit(63),
                        ).alias("bin"),
                        F.when(F.col("l_returnflag") == "A", 1)
                        .otherwise(0)
                        .alias("in_a"),
                        F.when(F.col("l_returnflag") == "R", 1)
                        .otherwise(0)
                        .alias("in_r"),
                    )
                )
            )
        )
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
