"""Skew-aware shuffle operators: salted joins and distinct-count rewrites.

At 100 TB a handful of hot keys (one power user in ``events``, one
blockbuster part in ``lineitem``) can put an entire shuffle partition on
one executor. Three mitigation tiers, cheapest first:

1. **AQE skew-join splitting** (``spark.sql.adaptive.skewJoin.enabled``,
   on in ``session.get_spark``): Spark splits oversized partitions at
   runtime. Covers sort-merge joins with moderate skew; needs no code.
2. **Broadcast**: if one side fits in memory there is no shuffle to
   skew. ``F.broadcast`` — see ``queries/joins.py``.
3. **Explicit salting** (this module): when the skewed side is joined
   against a side too big to broadcast, or when AQE can't help (e.g.
   the skew is in a grouping key rather than a join key).

Deliberately NOT here: salted ``groupBy().sum()`` — Spark's hash
aggregate already does map-side partial aggregation, so each hot key
contributes at most one partial row per task and the shuffle cannot
skew. Salting algebraic aggregations is cargo-culting; the cases that
genuinely skew are joins and ``count(distinct)`` (where the pre-shuffle
rows can't be combined), handled below.

Reference grounding: the reference has no joins at all (SURVEY.md §2A);
this generalizes its partitioning concern (`internal/cli/mapreduce.go:199-263`
bounds per-chunk work) to keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__mrs_salt"

#: join types for which key-salting preserves semantics: left rows get
#: exactly one salt value, so they are never duplicated; right rows are
#: replicated but only ever matched, never emitted unmatched.
_SALTABLE = {"inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"}


def row_salt_col(df: DataFrame, key_cols: list[str], n_salts: int) -> Column:
    """Deterministic per-row salt from the NON-key columns (public: the
    skew demo and downstream layouts reuse it to inspect or persist the
    salted distribution).

    The salt must vary *within* a hot key (salting by a function of the
    key alone would map the hot key to a single salt and change
    nothing), and must be deterministic under task retry (so no
    ``monotonically_increasing_id``/``rand``). Hashing the remaining
    columns satisfies both; fully duplicate rows collapse onto one salt,
    which only means duplicates don't spread — correctness is unaffected.

    A key-only frame has no row entropy to hash — there the salt is the
    input partition id: a hot key's rows live across many input
    partitions, so they still spread, and the value is stable under
    task retry (partition ids don't change on re-execution).
    """
    entropy = [c for c in df.columns if c not in key_cols]
    if not entropy:
        return F.pmod(F.spark_partition_id(), F.lit(n_salts))
    return F.pmod(F.xxhash64(*[F.col(c) for c in entropy]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side,
    replicate the (medium, unbroadcastable) right side ``n_salts``×.

    A hot left key spreads over ``n_salts`` shuffle partitions instead
    of one; the cost is scanning the right side once and shuffling it
    ``n_salts`` times — pick ``n_salts`` ≈ (hot-key rows / average-key
    rows) capped by cluster parallelism. Result is row-identical to
    ``left.join(right, on, how)`` (oracle-checked by ``q_join_salted``).
    """
    if how not in _SALTABLE:
        raise ValueError(
            f"salted_join supports {sorted(_SALTABLE)}; {how!r} would duplicate "
            "unmatched right rows (each exists once per salt replica)"
        )
    salted_left = left.withColumn(_SALT, row_salt_col(left, on, n_salts))
    replicated_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_left.join(replicated_right, [*on, _SALT], how)
    return joined.drop(_SALT)


def skew_spread_count_distinct(
    df: DataFrame, keys: list[str], distinct_col: str, alias: str
) -> DataFrame:
    """``groupBy(keys).agg(count_distinct(col))`` rewritten to dodge key skew.

    The direct form shuffles every pre-aggregation row of a hot key to
    one reducer (distinct values can't be partially counted). Phase 1
    instead shuffles on ``(keys, distinct_col)`` — the distinct column's
    cardinality spreads the hot key across the cluster — and dedups;
    phase 2 counts the now-unique rows per key, which map-side partial
    counting compresses to one row per key per task.
    """
    return (
        df.select(*keys, distinct_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(distinct_col).alias(alias))
    )
