"""Run any registered query by name from the command line.

Usage:
  python tools/run_query.py q_agg_basic
  python tools/run_query.py q_tpch_q21_onepass --sf /root/testdata/sf0.01 -n 50
  python tools/run_query.py q_join_range --explain
  python tools/run_query.py --list

`--explain` prints the formatted physical plan instead of rows —
the first thing to check before running anything at scale
(PushedFilters on scans, BroadcastHashJoin on dims, partial+final
HashAggregate pairs; see SCALING.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.io import DEFAULT_SF_DIR
from mapreduce_llm_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name (see --list)")
    ap.add_argument("--sf", default=DEFAULT_SF_DIR, help="testdata directory")
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the plan, not rows")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    registry.load_all()
    if args.list or not args.query:
        for name in sorted(registry.QUERIES):
            marker = "sql" if name in registry.ORACLE else "rows-only"
            print(f"{name}  [{marker}]")
        return 0
    if args.query not in registry.QUERIES:
        print(f"unknown query {args.query!r}; try --list", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"run-{args.query}")
    df = registry.QUERIES[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
