"""Round-15 STAGED surface — seed tranche.

Same staged-tranche contract the round-9..14 batches followed before
their flips (analytics_r13_staged → queries/analytics_r13.py in
round 14; analytics_r14_staged flips in round 15): the round-14 window
is fully allocated (50 pre-drafted pairs in ROUND14_WINDOW), so surface
built beyond that point stages HERE and flips in round 16. Every entry
is a complete (query fn, DuckDB oracle) pair hash-proven NOW at sf0.01
and the sf0.1 sweep env by tests/test_r15_staged.py through the same
harness the driver gate uses. NOT imported by registry.load_all —
importing this module must stay registry-side-effect free (pinned by
the staging test).

Determinism discipline: identical to the r9..r14 staging — exact
integer counts and e4/bp floors via nonneg integer division (abs +
CASE re-sign for anything that can cross zero, the CLAUDE.md
q_header_detail_recon rule), round(,4) only on the allowed
log/sqrt/corr class, nullif/CASE guards on data-dependent
denominators, packed nonneg-integer argmax instead of struct argmin
(the q_kmeans_step rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, DuckDB oracle SQL); round 16 flips these into
#: @query(oracle=...) declarations verbatim.
STAGED_R15: dict[str, tuple[QueryFn, str]] = {}


def _staged(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_R15:
            raise ValueError(f"duplicate staged query {name!r}")
        STAGED_R15[name] = (fn, oracle)
        return fn

    return deco


def _r15_words(col):
    """Lowercased alpha word array — the shared tokenization of the
    text queries (the _r14_words twin, kept module-local so the staged
    modules stay import-independent)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda w: w != F.lit("")
    )
