"""Misra–Gries heavy hitters: bounded-memory frequency summaries with
provable error, mergeable across partitions.

The frequency twin of the HLL distinct sketch (q_sketch_bounds):
exact top-k word counts over 100 TB need a full shuffle of every
distinct token; a Misra–Gries summary holds k counters per partition
— O(k) memory however long the stream — and guarantees, per
partition p with ``dec_p`` decrement rounds:

    est_p(x) ≤ true_p(x) ≤ est_p(x) + dec_p        (bounds)
    true_p(x) > dec_p  ⇒  x is in the summary      (containment)

Summaries merge by summing estimates; with the input hash-partitioned
on the item, each item lives in exactly one partition and the global
guarantees follow with Σ_p dec_p as the error term. The summary
CONTENT depends on arrival order (any streaming summary does); the
GUARANTEES do not — which is why the declared query emits only exact
values and theorem booleans (deterministic), never raw estimates.

The per-partition pass is a mapInPandas fold: counters live across
the partition's Arrow batches in a plain dict; the decrement-all
round is O(k) and fires at most n/k times, so the pass is O(n)
total. At 100 TB this is the only stage that touches raw tokens; the
merge moves k rows per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(
    df: DataFrame, col: str, k: int, num_partitions: int = 8
) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``df[col]`` with ``k``
    counters each: one output row per surviving counter, carrying the
    partition's decrement count and item total for the error algebra.
    The input is hash-partitioned on the item column so each distinct
    item is summarized by exactly one partition."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        dec = 0
        n = 0
        for pdf in batches:
            for item in pdf[col].to_numpy():
                # NULL input values would be counted under a None
                # counter key and emitted as item=NULL — colliding
                # with the cancelled-counters sentinel row below, and
                # silently dropped by any consumer filtering
                # `item IS NOT NULL` (as the merge does). NULLs are
                # not stream elements; skip them so n and the error
                # bound describe the non-null stream exactly.
                if item is None or item != item:
                    continue
                n += 1
                c = counters.get(item)
                if c is not None:
                    counters[item] = c + 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dec += 1
                    dead = []
                    for key, v in counters.items():
                        if v == 1:
                            dead.append(key)
                        else:
                            counters[key] = v - 1
                    for key in dead:
                        del counters[key]
        if counters:
            items, ests = list(counters.keys()), list(counters.values())
        else:
            # a partition whose counters all cancelled (or saw no rows)
            # still must report its decrement count — losing a dec
            # would understate the global error bound and void the
            # theorem; the sentinel row carries it with a NULL item
            items, ests = [None], [0]
        yield pd.DataFrame(
            {
                "item": items,
                "est": ests,
                "pid": pid,
                "part_dec": dec,
                "part_n": n,
            }
        )

    return (
        df.select(F.col(col).alias(col))
        .repartition(num_partitions, col)
        .mapInPandas(
            summarize,
            schema="item string, est long, pid int, part_dec long, part_n long",
        )
    )
