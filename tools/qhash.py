"""Order-insensitive output hash of named queries — the equivalence gate
for optimization refactors (round 15).

Computes exactly driver_sim's canonical value hash (column-sorted,
row-sorted, canon() cell encoding) of each named query's Spark output at
the given SF dir. Run BEFORE and AFTER a refactor; identical hashes at
sf0.01 AND sf0.1 prove the rewrite is result-identical on data 10x
beyond what the driver checks.

Usage: python tools/qhash.py [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_caic_spark.registry import all_specs  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402

# The whole point of this tool is to compute EXACTLY driver_sim's hash;
# import its canonicalization instead of copy-pasting it (r15 ADVICE:
# a future edit to driver_sim's canon() would silently desynchronize
# the equivalence gate).
from tools.driver_sim import canon, value_hash  # noqa: E402, F401


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="qhash-r15", cpus=cpus)
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        print(f"{name} {len(rows)} {value_hash(df.columns, rows)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
