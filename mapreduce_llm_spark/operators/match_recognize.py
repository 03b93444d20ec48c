"""MATCH_RECOGNIZE-style sequence pattern matching as a Catalyst
composition — no Python in the row path.

SQL:2016 row-pattern recognition (Flink/Oracle MATCH_RECOGNIZE; the
reference has no sequence operator — this generalizes the engine's
q_seq_pattern regex-over-initials into define/measure row semantics)
compiled onto Spark built-ins in five JVM-side steps, one row per
partition key until the final per-match explode:

1. CLASSIFY  — each row gets a single-char symbol from the DEFINE
   list (first predicate that holds wins, else the default symbol).
2. ENCODE    — per partition key, rows collapse to ONE ordered
   array<struct> (collect_list + array_sort on the order columns) and
   the symbol chars join into a compact "symbol string".
3. MATCH     — the PATTERN (a regex over symbol chars) runs ONCE per
   key via regexp_replace(s, pattern, '<$0>'): Java's replace-all is
   left-to-right, non-overlapping, greedy — exactly MATCH_RECOGNIZE's
   AFTER MATCH SKIP PAST LAST ROW with greedy quantifiers.
4. DECODE    — match positions fall out of the bracketed string by
   pure length arithmetic: split on '<', then one F.aggregate fold
   carries the running character offset and emits (start, len) per
   match. No regex engine exposes positions in SQL; the bracket trick
   recovers them from lengths alone, so an independent engine can
   re-derive them with a window cumsum (the DuckDB oracle does).
5. MEASURES  — each match row carries the matched rows themselves
   (slice of the ordered array), so callers compute arbitrary
   measures with F.transform / F.aggregate over `match_rows` —
   FIRST(x), LAST(x), COUNT(B.*), SUM(x) all reduce to array ops.

Scale shape: one shuffle on the partition key; the per-key state is
the key's own row array (the same bound every MATCH_RECOGNIZE
implementation carries — a pattern can span the whole partition), so
callers cap rows per key upstream exactly like q_seq_pattern's
rank<=1000 guard. The regex runs once per key on a string with one
char per row, not per row.

AFTER MATCH modes:
- ``skip_past_last_row`` (default): Java replace-all semantics —
  non-overlapping left-to-right greedy matches, the bracket walk
  above.
- ``skip_to_next_row`` (since round 7): OVERLAPPING matches — the
  engine retries from every row, not just past the last match. The
  bracket trick cannot express this (a char can belong to several
  matches), so the overlap path explodes candidate start positions
  and runs the ANCHORED greedy regex at each: O(L) regex probes of
  O(L) substrings per key instead of one pass — the per-key cost is
  O(L²) worst case, which is the inherent bound of overlap-mode row
  pattern matching (every engine pays it); callers cap rows per key
  upstream exactly as for the default mode, and the explode itself
  is JVM-side (Generate + regexp_extract, zero Python).

Restrictions vs full SQL:2016 (documented, deliberate):
- Symbol classification is deterministic first-match-wins; the
  standard lets pattern backtracking resolve ambiguous DEFINEs. With
  disjoint predicates (the overwhelmingly common case) the semantics
  coincide.
- The pattern must not match the empty string (a zero-width match
  would bracket nothing and desynchronize the length walk); a
  best-effort guard rejects patterns where every atom is optional.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RESERVED = {"<", ">"}


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    symbols: list[tuple[str, Column]],
    pattern: str,
    default_symbol: str = "x",
    after_match: str = "skip_past_last_row",
) -> DataFrame:
    """One output row per pattern match: the partition columns plus
    ``match_no`` (1-based, in sequence order), ``start_pos`` /
    ``match_len`` (1-based positions in the key's ordered sequence)
    and ``match_rows`` — an array<struct> of the matched input rows in
    order, ready for measure expressions.

    ``order_by`` must be a total order within each key (include a
    unique tie-break column last); ``symbols`` maps single chars to
    row predicates, first match wins; ``pattern`` is a regex over
    those chars; ``after_match`` picks non-overlapping
    (``skip_past_last_row``) or overlapping (``skip_to_next_row``)
    semantics — see the module docstring for the cost model."""
    if after_match not in ("skip_past_last_row", "skip_to_next_row"):
        raise ValueError(f"unknown after_match mode {after_match!r}")
    for ch, _ in symbols:
        if len(ch) != 1 or ch in _RESERVED:
            raise ValueError(f"symbol must be a single non-reserved char, got {ch!r}")
    if len(default_symbol) != 1 or default_symbol in _RESERVED:
        raise ValueError(f"bad default symbol {default_symbol!r}")
    if any(r in pattern for r in _RESERVED):
        raise ValueError("pattern must not contain the reserved chars < >")
    import re as _re

    if _re.fullmatch(pattern, ""):
        raise ValueError("pattern must not match the empty string")

    sym: Column = F.lit(default_symbol)
    for ch, cond in reversed(symbols):
        sym = F.when(cond, F.lit(ch)).otherwise(sym)

    payload = F.struct(*[F.col(c) for c in df.columns])
    ordered = (
        df.withColumn("__sym", sym)
        .groupBy(*partition_by)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_by)],
                        F.col("__sym").alias("sym"),
                        payload.alias("row"),
                    )
                )
            ).alias("seq")
        )
    )

    s = F.array_join(F.transform("seq", lambda r: r["sym"]), "")

    if after_match == "skip_to_next_row":
        from pyspark.sql.window import Window

        # Overlap mode: probe the ANCHORED greedy regex at every start
        # position. The symbol string has one char per row, so the
        # probe explode is bounded by the per-key row cap the caller
        # already owes the default mode.
        probes = ordered.withColumn("__s", s).select(
            *partition_by,
            F.col("seq").alias("__seq"),
            "__s",
            F.explode(F.sequence(F.lit(1), F.length("__s"))).alias("__i"),
        )
        hits = probes.withColumn(
            "__m",
            F.regexp_extract(
                F.col("__s").substr(F.col("__i"), F.length("__s")),
                "^(?:" + pattern + ")",
                0,
            ),
        ).where(F.col("__m") != "")
        order_w = Window.partitionBy(*partition_by).orderBy("__i")
        return hits.select(
            *partition_by,
            F.row_number().over(order_w).alias("match_no"),
            F.col("__i").cast("long").alias("start_pos"),
            F.length("__m").cast("int").alias("match_len"),
            F.transform(
                F.slice("__seq", F.col("__i"), F.length("__m")),
                lambda r: r["row"],
            ).alias("match_rows"),
        )

    bracketed = F.regexp_replace(s, pattern, "<$0>")
    parts = F.split(bracketed, "<")

    # Fold the tail parts ("match>trail" each) carrying the running
    # character offset; emit (start, len) per match. The '<' delimiters
    # are already consumed by split; each part spends one char on '>'.
    matches = F.aggregate(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        F.struct(
            F.length(F.element_at(parts, 1)).cast("long").alias("pos"),
            F.expr("CAST(array() AS ARRAY<STRUCT<start: LONG, mlen: INT>>)").alias(
                "ms"
            ),
        ),
        lambda acc, p: F.struct(
            (acc["pos"] + F.length(p) - 1).alias("pos"),
            F.concat(
                acc["ms"],
                F.array(
                    F.struct(
                        (acc["pos"] + 1).alias("start"),
                        F.length(F.substring_index(p, ">", 1))
                        .cast("int")
                        .alias("mlen"),
                    )
                ),
            ).alias("ms"),
        ),
        lambda acc: acc["ms"],
    )

    exploded = ordered.select(
        *partition_by,
        F.col("seq").alias("__seq"),
        F.posexplode(matches).alias("__mi", "__m"),
    )
    return exploded.select(
        *partition_by,
        (F.col("__mi") + 1).alias("match_no"),
        F.col("__m.start").alias("start_pos"),
        F.col("__m.mlen").alias("match_len"),
        F.transform(
            F.slice("__seq", F.col("__m.start").cast("int"), F.col("__m.mlen")),
            lambda r: r["row"],
        ).alias("match_rows"),
    )
