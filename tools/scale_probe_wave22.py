"""Focused scale probe for the round-15 wave22a queries. Expected laws:

- text_exactsubstr_removal: positional-gram stream is ~n_tokens rows
  (md5-keyed before the shuffle); df window + doc-grain island agg +
  doc-grain rebuild join — linear. Replication multiplies every gram's
  corpus count (replicas are verbatim copies), so the DUPLICATED share
  approaches 100% at high factors — the rebuild leg's per-row
  exists-filter cost stays bounded by n_islands ≤ n_tokens/8.
- data_d4_prototype_prune: broadcast-centroid arg-max scan + cluster
  sizes + per-cluster rank window — linear, no pair join anywhere.
- eval_bt_strength: zero-exchange scorer scan + ONE map-side hist
  groupBy; everything after runs on the domain-bounded
  (sources × grid) frame — linear with a constant tail.

Usage: python tools/scale_probe_wave22.py [factors...] (default 1 10 30 100)
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
    "text_exactsubstr_removal",
    "data_d4_prototype_prune",
    "eval_bt_strength",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark(app_name="scale-probe-w22", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        sfdir = SF_DIR
        if factor > 1:
            sfdir = scratch_path(f"w19_sf_x{factor}")  # shared replica cache
            os.makedirs(sfdir, exist_ok=True)
            for name, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
                dst = os.path.join(sfdir, f"{name}.parquet")
                if not os.path.exists(dst):
                    replicate(spark, name, factor, idc, 10_000_000).write.mode(
                        "overwrite"
                    ).parquet(dst)

        row = {"factor": factor, "load1": round(os.getloadavg()[0], 2)}
        for q in QUERIES:
            fn = REGISTRY[q].fn
            row[q] = timeit(lambda: noop(fn(spark, sfdir)))
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
