"""Snapshot formatted physical plans for named queries into a
directory — the before/after evidence for optimization rounds
(plans/r14/<query>_before.txt / _after.txt).

Usage:
  python tools/plan_snap.py --out plans/r14 --suffix before q_a q_b ...
  python tools/plan_snap.py --out plans/r14 --suffix before --headline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", help="query names")
    ap.add_argument("--headline", action="store_true", help="all headline queries")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    names = list(args.queries)
    if args.headline:
        from bench import HEADLINE

        names += [n for n in HEADLINE if n not in names]
    registry.load_all()
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="plan-snap")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = registry.QUERIES[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(jmode)
        except Exception as exc:  # noqa: BLE001 - record, keep snapshotting
            plan = f"ERROR building plan: {exc!r}"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan.rstrip() + "\n")
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
