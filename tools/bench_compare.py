"""Compare two bench records on their COMMON query subset.

The headline suite grows every round, so comparing suite totals (or
even means) across rounds conflates engine speed with suite
composition. This tool does what the round judge does by hand: restrict
to the intersection of queries, compare sums, and list the per-query
deltas beyond a noise threshold.

Usage: python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
Accepts either a raw ``bench.py`` JSON line or the driver's wrapper
format (``{"n": ..., "rc": ..., "tail": "...{json}..."}``).
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data
    # driver wrapper: the bench line is embedded in the captured tail
    m = re.findall(r'\{"metric".*\}', data.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench JSON line found")
    return json.loads(m[-1])


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    if not common:
        raise SystemExit("no common queries")
    so, sn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(
        f"common subset: {len(common)} queries  "
        f"old={so:.2f}s  new={sn:.2f}s  ratio={sn / so:.3f}x"
    )
    print(
        f"old-only: {len(set(qo) - set(qn))}  new-only: {len(set(qn) - set(qo))}"
    )
    deltas = sorted(common, key=lambda q: qn[q] - qo[q])
    moved = [
        q
        for q in deltas
        if abs(qn[q] - qo[q]) > 0.1 and abs(qn[q] - qo[q]) / max(qo[q], 1e-9) > 0.10
    ]
    for q in moved:
        print(f"  {q:32s} {qo[q]:7.3f} -> {qn[q]:7.3f}  ({qn[q] - qo[q]:+.3f})")


if __name__ == "__main__":
    try:
        main()
        sys.stdout.flush()  # flush INSIDE the try: the at-exit flush
        # would raise BrokenPipeError outside any handler
    except BrokenPipeError:  # piped to head: not an error
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        os._exit(0)
