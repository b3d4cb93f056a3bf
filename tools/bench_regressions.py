"""Per-query bench regression diff between two BENCH_FULL_r{N}.json
archives (round-5 verdict item 5: per-round full timings + a regression
table so the judge can diff without git archaeology).

Usage: python tools/bench_regressions.py [prev.json curr.json]
With no args, diffs the two most recent BENCH_FULL_r*.json archives.
Prints a markdown table of queries slower than REGRESSION_FACTOR x their
prior-round time (and faster ones over the same factor, as wins), ready
to paste into SCALE.md. Exit code is always 0 — the table is evidence,
not a gate (this sandbox's scheduler stalls make single-run times noisy;
bench.py's stall-retry already floors the worst of it).
"""

from __future__ import annotations

import json
import os
import re
import sys

REGRESSION_FACTOR = 1.5
# Ignore sub-second queries entirely: six of the nine r7 flags were
# 0.3-0.7 s scheduler jitter on ~0.3 s queries (round-7 verdict ask #8).
MIN_SECONDS = 1.0


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) == 3:
        prev_path, curr_path = sys.argv[1], sys.argv[2]
    else:
        archives = sorted(
            f
            for f in os.listdir(repo)
            if re.match(r"BENCH_FULL_r\d+\.json$", f)
        )
        if len(archives) < 2:
            print(f"need two archives, found {archives}")
            return
        prev_path = os.path.join(repo, archives[-2])
        curr_path = os.path.join(repo, archives[-1])
    def axis(path: str) -> dict:
        # Prefer the steal_adjusted axis (r14+): per-query min over all
        # measurements — the cross-round comparison axis. Raw first-run
        # values remain under "queries" for older archives.
        data = json.load(open(path))
        return data.get("steal_adjusted", {}).get("queries") or data[
            "queries"
        ]

    prev = axis(prev_path)
    curr = axis(curr_path)
    shared = sorted(set(prev) & set(curr))
    rows = []
    for name in shared:
        a, b = prev[name], curr[name]
        if a <= 0 or b <= 0 or max(a, b) < MIN_SECONDS:
            continue
        if b > a * REGRESSION_FACTOR or a > b * REGRESSION_FACTOR:
            rows.append((name, a, b, b / a))
    print(f"# Bench diff: {os.path.basename(prev_path)} -> "
          f"{os.path.basename(curr_path)} "
          f"({len(shared)} shared queries, threshold {REGRESSION_FACTOR}x)")
    if not rows:
        print("No query changed by more than the threshold.")
        return
    print("| query | prev s | curr s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.2f}x |")


if __name__ == "__main__":
    main()
