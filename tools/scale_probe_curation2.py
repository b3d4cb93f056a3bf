"""Scale probe for the round-8 curation wave (plans/curation2q).

Replicates the documents table factor-x with per-replica alphabet
rotation (tools/scale_probe.replicate — replicas are distinct docs, so
dup-rate stays constant as the corpus grows), writes it to a scratch
sf-dir, and times each registered query end-to-end through the same
(spark, sf_dir) entry the driver uses. A linear wall/factor curve means
no hidden quadratic stage.

Usage: python tools/scale_probe_curation2.py [factors...]  (default 1 10 30)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from etl_caic_spark.registry import all_specs  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402
from etl_caic_spark.util import scratch_path  # noqa: E402
from tools.scale_probe import replicate, timeit  # noqa: E402

QUERIES = (
    "dedup_paragraph_cdc",
    "data_mixture_temperature",
    "text_perplexity_buckets",
    "quality_gopher_rules",
)


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-curation2", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    specs = all_specs()
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for factor in factors:
        docs = replicate(spark, "documents", factor, "doc_id", 10_000_000)
        sf_dir = scratch_path(f"curation2_sf_x{factor}")
        os.makedirs(sf_dir, exist_ok=True)
        docs.write.mode("overwrite").parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        for q in QUERIES:
            sec = timeit(
                lambda: specs[q]
                .fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            results[q][factor] = round(sec, 2)
            print(f"x{factor:<3} {q:<28} {sec:6.2f}s", flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
