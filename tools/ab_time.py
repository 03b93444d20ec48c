"""Isolated A/B timing for named queries: one fresh session, warm-up
pass, N measured passes via the noop sink, median per query — the
same methodology as bench.py, runnable on any subset so an
optimization's effect can be read without the 122-query suite.

Usage:
  python tools/ab_time.py q_abc_classification q_rank_fusion
  python tools/ab_time.py --passes 5 --sf /root/testdata/sf0.1 q_x
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+", help="registered query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark(app_name="ab-time")
    from bench import run_query

    for name in args.queries:  # warm-up: JIT, parquet footers, workers
        run_query(registry.QUERIES[name], spark, args.sf)
    samples: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.passes):
        for name in args.queries:
            samples[name].append(
                run_query(registry.QUERIES[name], spark, args.sf)
            )
    out = {
        n: {
            "median": round(sorted(ts)[len(ts) // 2], 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
        }
        for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
