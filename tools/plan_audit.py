"""Plan audit: dump a one-line physical-plan summary per registered query
(join strategies, exchange count, scan pushdown) and flag smells:
CartesianProduct, row-at-a-time PythonUDF (BatchEvalPython), scans with no
pruned schema where a filter exists. Usage: python tools/plan_audit.py [sf_dir]"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from etl_caic_spark.registry import all_specs  # noqa: E402
from etl_caic_spark.session import get_spark  # noqa: E402

INTERESTING = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Expand",
    "Generate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
]


def summarize(plan: str) -> str:
    counts = {}
    for op in INTERESTING:
        n = len(re.findall(rf"\b{op}\b", plan))
        if n:
            counts[op] = n
    counts["Exchange"] = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    return " ".join(f"{k}x{v}" for k, v in sorted(counts.items()))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit", cpus=4)
    smells = []
    for name, spec in sorted(all_specs().items()):
        if name == "stream_watermark":
            print(f"{name:28s} (skipped: runs a live streaming query)")
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:28s} ERROR {exc}")
            smells.append((name, "build error"))
            continue
        s = summarize(plan)
        flags = []
        if "CartesianProduct" in s:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in s:
            flags.append("ROW_PYTHON_UDF")
        print(f"{name:28s} {s} {'  <<< ' + ','.join(flags) if flags else ''}")
        for f in flags:
            smells.append((name, f))
    print("\nsmells:", smells if smells else "none")
    spark.stop()


if __name__ == "__main__":
    main()
