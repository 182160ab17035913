"""Matched-window A/B of bench_extra query subsets between two trees.

This VM's burst-credit throttle swings wall times 1.3-3x on minute
scales, so sequential before/after measurements mostly record weather
(round-5's lesson). This driver alternates SUBPROCESS runs of the same
query subset between two checkouts (A, B, A, B, ...) so each pair shares
a weather window, then reports per-query best-of and paired ratios.

Usage:
  python scripts/ab_paired.py <treeA> <treeB> <queries> [pairs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_once(tree: str, queries: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench_extra.py"), "time",
         "--reps", "1", "--queries", queries],
        capture_output=True, text=True, cwd=tree,
        env={**os.environ, "PYTHONPATH": tree},
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)["queries_min"]
        except (json.JSONDecodeError, KeyError):
            continue
    raise RuntimeError(f"no parseable output from {tree}: {out.stderr[-1500:]}")


def main() -> None:
    tree_a, tree_b, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    res: dict[str, list[dict]] = {"A": [], "B": []}
    for i in range(pairs):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            r = run_once(tree, queries)
            res[label].append(r)
            print(json.dumps({"pair": i, "tree": label, **r}), flush=True)
    names = res["A"][0].keys()
    summary = {}
    for q in names:
        a = [r[q] for r in res["A"]]
        b = [r[q] for r in res["B"]]
        ratios = [round(b[i] / a[i], 3) for i in range(len(a))]
        summary[q] = {
            "A_min": min(a), "B_min": min(b),
            "best_of_ratio_B_over_A": round(min(b) / min(a), 3),
            "paired_ratios": ratios,
        }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
