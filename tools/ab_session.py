"""IN-SESSION A/B harness — the only trustworthy local instrument on
this host (VERDICT r14 "What's wrong" #6): isolated cross-run timings
drift 1.1-1.6x on identical code, so both variants are constructed and
timed in ONE SparkSession, alternating A/B per pass, with the md5-2M
CPU anchor co-measured before and after so every reported ratio can be
read against host state.

Variant construction:
  --nockpt NAME   variant A = the registered query as written;
                  variant B = the same function with
                  DataFrame.localCheckpoint patched to identity (the
                  exact "without the materialization barrier" form).
  --vs NAME_B     variant B = a second registered query name (for
                  experiments staged as *_ab_variant functions).

Usage:
  python tools/ab_session.py q_kmeans_step --nockpt
  python tools/ab_session.py q_x --vs q_x_variant --passes 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.session import get_spark


def _noop_local_checkpoint(self, eager=True, storageLevel=None):
    return self


class patched_no_checkpoint:
    """Context manager: DataFrame.localCheckpoint becomes identity.

    ``lazy_only=True`` no-ops only ``eager=False`` calls (the
    sort_barrier sites), leaving eager operator checkpoints intact —
    the clean A/B for barrier-only deltas in queries that also use
    eager checkpoints."""

    def __init__(self, lazy_only: bool = False):
        self._lazy_only = lazy_only

    def __enter__(self):
        from pyspark.sql import DataFrame

        orig = DataFrame.localCheckpoint
        self._orig = orig
        if self._lazy_only:

            def lazy_noop(df, eager=True, storageLevel=None):
                if eager:
                    return orig(df, eager=eager, storageLevel=storageLevel)
                return df

            DataFrame.localCheckpoint = lazy_noop
        else:
            DataFrame.localCheckpoint = _noop_local_checkpoint
        return self

    def __exit__(self, *exc):
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = self._orig
        return False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", help="registered query name (variant A)")
    ap.add_argument(
        "--nockpt",
        action="store_true",
        help="variant B = same query, localCheckpoint patched to identity",
    )
    ap.add_argument(
        "--nolazyckpt",
        action="store_true",
        help="variant B = same query, only eager=False localCheckpoints "
        "(sort_barrier sites) patched to identity",
    )
    ap.add_argument("--vs", default=None, help="variant B = this query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()
    if not (args.nockpt or args.nolazyckpt or args.vs):
        ap.error("need --nockpt, --nolazyckpt or --vs")

    from tools.host_anchor import cpu_anchor

    anchor_start = cpu_anchor()

    registry.load_all()
    spark = get_spark(app_name="ab-session")
    from bench import run_query

    qa = registry.QUERIES[args.query]
    qb = registry.QUERIES[args.vs] if args.vs else qa

    def time_a() -> float:
        return run_query(qa, spark, args.sf)

    def time_b() -> float:
        if args.nockpt or args.nolazyckpt:
            with patched_no_checkpoint(lazy_only=args.nolazyckpt):
                return run_query(qb, spark, args.sf)
        return run_query(qb, spark, args.sf)

    # warm-up both variants (JIT, parquet footers, Python workers)
    time_a()
    time_b()
    a_ts: list[float] = []
    b_ts: list[float] = []
    for i in range(args.passes):
        # alternate starting side per pass so order bias cancels
        if i % 2 == 0:
            a_ts.append(time_a())
            b_ts.append(time_b())
        else:
            b_ts.append(time_b())
            a_ts.append(time_a())

    anchor_end = cpu_anchor()
    med_a = statistics.median(a_ts)
    med_b = statistics.median(b_ts)
    out = {
        "query": args.query,
        "variant_b": args.vs
        or f"{args.query} (no {'lazy ' if args.nolazyckpt else ''}localCheckpoint)",
        "passes": args.passes,
        "a_median": round(med_a, 3),
        "b_median": round(med_b, 3),
        "b_over_a": round(med_b / med_a, 3),
        "a_all": [round(t, 3) for t in a_ts],
        "b_all": [round(t, 3) for t in b_ts],
        "anchor": {"start": anchor_start, "end": anchor_end},
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
