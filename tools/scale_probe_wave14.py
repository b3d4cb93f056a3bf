"""Focused scale probe for the round-10 wave14 queries (probe-before-
ship discipline, r9 verdict ask #6): none is iterative or blocked, so
the expectation is plain linearity — the probe MEASURES it instead of
asserting it.

- wilcoxon: one fact groupBy + a groupBy onto the distinct-|d| frame +
  with_global_order cumulation (range shuffle + O(P) offsets) — linear
  in orders.
- kaplan-meier: fact groupBy to spans + two cumulations over the
  DATE-SPAN-BOUNDED duration grid — the grid cannot grow with rows, so
  only the span pass scales (linear).
- jsd: two token groupBys + a vocab-grain full-outer join — linear in
  tokens (replicated documents rotate their alphabet, so vocab grows
  linearly too, per tools/scale_probe.py).
- mrr: customer-partitioned rank window + per-customer min — linear.
- silhouette: broadcast k x dim centroids onto a linear corpus scan.

Usage: python tools/scale_probe_wave14.py [factors...] (default 1 10 30)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from etl_caic_spark.plans import REGISTRY  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timeit  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-w14", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        # replicate() caches the scaled tables under scratch parquet;
        # point the queries at a view-substituted sf dir by registering
        # replicas as temp views is not possible (queries read parquet
        # paths), so replicate into a scratch dir laid out like an
        # sf dir instead.
        import os

        from etl_caic_spark.util import scratch_path

        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w14_sf_x{factor}")
            os.makedirs(sfdir, exist_ok=True)
            for name, idc, shift in (
                ("orders", "o_orderkey", 100_000_000),
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
            "stat_wilcoxon_signed_rank",
            "stat_kaplan_meier",
            "stat_js_divergence",
            "eval_mrr",
            "eval_silhouette_labels",
        ):
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
