"""Broadcast-hint lint: flag ``F.broadcast`` on SF-scaling table legs.

Round-9 verdict finding #1: 24 queries force-broadcast a projection of
part/customer/supplier — tables that grow linearly with scale factor.
``F.broadcast`` is not advisory (Spark attempts the build regardless of
runtime size), so the hint that is harmless at sf0.1 becomes a forced
multi-GB broadcast at the 100-TB design point — the exact class whose
forced broadcast OOM'd ``kcore_peel_trace`` at sf10 (ROUND9_NOTES item
6, ``operators/graph.py:190``). Policy: hint only fixed-cardinality
legs (nation/region, 1-row or grid aggregates); for anything that
scales with SF, leave the join unhinted and let AQE broadcast when the
runtime size is actually under threshold.

This lint parses every module under ``mapreduce_llm_spark/`` and flags
``F.broadcast(x)`` (or bare ``broadcast(x)``) where ``x`` derives from
``load_table(..., <scaling table>)``. Classification is cardinality-
aware (round-10 advisor findings):

- ``select/filter/join/...`` pass the input's scale through.
- A global ``.agg(...)`` or an all-aggregate ``.select(...)`` emits one
  row — bounded.
- ``.distinct()`` / ``.dropDuplicates()`` / ``.groupBy(...).agg(...)``
  over a SCALING input stay **scaling**: the distinct partkeys of
  lineitem grow linearly with SF even though the op "reduces". Only a
  reviewed ``ALLOWED_BOUNDED`` entry (keyed by function AND hint
  argument, so an unrelated future hint in the same function cannot
  ride the waiver) may bless a provably fixed-cardinality key set.
- ``limit/summary/describe`` bound the output regardless of input.

KNOWN BLIND SPOT (documented, reviewed): the lint is static and
intra-module — a DataFrame arriving as a FUNCTION PARAMETER classifies
'other' and is skipped, so a hint on a parameter inside a library
operator (e.g. the stream-static join in ``streaming/pipeline.py``,
which broadcasts a caller-supplied dimension leg) is invisible here.
Those call sites are covered by review + the runtime plan lint
(tests/test_plan_lint.py sweeps every registered query's physical
plan), not by this AST pass.

CLI: ``python tools/broadcast_lint.py`` prints one ``path:line var``
per violation and exits non-zero if any. The test suite pins the
violation set to empty (tests/test_plan_lint.py).
"""

from __future__ import annotations

import ast
import os
import sys

# Tables whose row count grows linearly with scale factor. nation (25
# rows) and region (5) are fixed-cardinality and fine to hint.
SCALING_TABLES = {
    "part",
    "partsupp",
    "customer",
    "supplier",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

# DataFrame methods that keep (or can keep) the input's scale.
_PASSTHROUGH = {
    "select",
    "selectExpr",
    "filter",
    "where",
    "withColumn",
    "withColumns",
    "withColumnRenamed",
    "withColumnsRenamed",
    "alias",
    "drop",
    "dropna",
    "fillna",
    "na",
    "fill",
    "cache",
    "persist",
    "checkpoint",
    "localCheckpoint",
    "repartition",
    "repartitionByRange",
    "coalesce",
    "sort",
    "orderBy",
    "sortWithinPartitions",
    "sample",
    "union",
    "unionAll",
    "unionByName",
    "join",
    "crossJoin",
    "hint",
    "withWatermark",
    "transform",
    "cast",
    # key-cardinality-preserving "reducers": the output row count is
    # the distinct key count of the input, which scales with SF unless
    # the keys are provably fixed — reviewed via ALLOWED_BOUNDED.
    "distinct",
    "dropDuplicates",
    "groupBy",
    "groupby",
    "rollup",
    "cube",
}

# Methods that bound the output regardless of input scale. ``agg`` is
# handled specially: bounded only when called DIRECTLY on a DataFrame
# (global 1-row aggregate), scaling when it closes a groupBy over a
# scaling input.
_REDUCING = {"limit", "summary", "describe"}

# Aggregate functions: a .select() whose every column is one of these
# (possibly .alias()'d) emits exactly one row — a bounded leg.
_AGG_FNS = {
    "count",
    "countDistinct",
    "count_distinct",
    "sum",
    "sum_distinct",
    "min",
    "max",
    "avg",
    "mean",
    "first",
    "last",
}

_FUNC_TYPES = (ast.FunctionDef, ast.AsyncFunctionDef)


def _is_agg_expr(node: ast.expr) -> bool:
    """True for F.count(...), F.countDistinct(...).alias(...), etc."""
    if not isinstance(node, ast.Call):
        return False
    fn = node.func
    if isinstance(fn, ast.Attribute):
        if fn.attr == "alias":
            return _is_agg_expr(fn.value)
        return fn.attr in _AGG_FNS
    if isinstance(fn, ast.Name):
        return fn.id in _AGG_FNS
    return False


def _classify(node: ast.expr, env: dict[str, str]) -> str:
    """Return 'scaling' | 'bounded' | 'other' for an expression."""
    if isinstance(node, ast.Name):
        return env.get(node.id, "other")
    if isinstance(node, ast.Call):
        fn = node.func
        # load_table(spark, sf_dir, "part") / io.load_table(...)
        callee = fn.attr if isinstance(fn, ast.Attribute) else (
            fn.id if isinstance(fn, ast.Name) else None
        )
        if callee == "load_table":
            for arg in node.args:
                if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                    if arg.value in SCALING_TABLES:
                        return "scaling"
                    return "bounded"
            return "other"
        if isinstance(fn, ast.Attribute):
            if fn.attr in _REDUCING:
                return "bounded"
            if fn.attr == "agg":
                base = fn.value
                if (
                    isinstance(base, ast.Call)
                    and isinstance(base.func, ast.Attribute)
                    and base.func.attr in ("groupBy", "groupby", "rollup", "cube")
                ):
                    # grouped aggregate: cardinality = the key count of
                    # the grouped input — scaling keys stay scaling
                    inner = _classify(base.func.value, env)
                    return "scaling" if inner == "scaling" else "bounded"
                # global .agg(...) on a DataFrame: exactly one row
                return "bounded"
            if fn.attr == "select" and node.args and all(
                _is_agg_expr(a) for a in node.args
            ):
                return "bounded"
            if fn.attr in _PASSTHROUGH:
                base = _classify(fn.value, env)
                arg_cls = [_classify(a, env) for a in node.args]
                if base == "scaling" or "scaling" in arg_cls:
                    return "scaling"
                if base == "bounded":
                    return "bounded"
                return "other"
            # unknown method: inherit the receiver's class
            return _classify(fn.value, env)
    if isinstance(node, ast.Attribute):
        return _classify(node.value, env)
    return "other"


def _is_broadcast_call(node: ast.Call) -> bool:
    fn = node.func
    if isinstance(fn, ast.Attribute) and fn.attr == "broadcast":
        return True
    if isinstance(fn, ast.Name) and fn.id == "broadcast":
        return True
    return False


def lint_source(src: str, path: str = "<src>") -> list[tuple[str, int, str]]:
    """Return [(path, lineno, description)] for every scaling-leg hint.

    Walks the module ONCE with an explicit scope map (round-10 advisor
    finding): module-level code and async functions are checked, nested
    defs are visited exactly once, and each broadcast call resolves
    names against the assignment env of its own scope chain (innermost
    function outward to module), never a sibling's.
    """
    tree = ast.parse(src)

    # innermost enclosing scope (function node or the module) per node
    scope_of: dict[ast.AST, ast.AST] = {}

    def visit(node: ast.AST, scope: ast.AST) -> None:
        scope_of[node] = scope
        for child in ast.iter_child_nodes(node):
            visit(child, node if isinstance(node, _FUNC_TYPES) else scope)

    # top-level: the module is its own scope; a function node itself
    # belongs to the scope it is DEFINED in, its body to itself
    for child in ast.iter_child_nodes(tree):
        visit(child, tree)
    scope_of[tree] = tree

    assigns_by_scope: dict[ast.AST, list[ast.Assign]] = {}
    calls: list[tuple[ast.Call, ast.AST]] = []
    for node, scope in scope_of.items():
        # a def's body nodes carry the def itself as scope; the def
        # node's own scope is where it was defined
        owner = node if isinstance(node, _FUNC_TYPES) else scope
        if isinstance(node, ast.Assign):
            assigns_by_scope.setdefault(scope, []).append(node)
        elif isinstance(node, ast.Call) and _is_broadcast_call(node):
            calls.append((node, scope))
        del owner

    def scope_chain(scope: ast.AST) -> list[ast.AST]:
        chain = [scope]
        while scope is not tree:
            scope = scope_of[scope]
            if isinstance(scope, _FUNC_TYPES) or scope is tree:
                chain.append(scope)
        return chain

    violations: list[tuple[str, int, str]] = []
    for call, scope in sorted(calls, key=lambda c: c[0].lineno):
        if not call.args:
            continue
        chain = scope_chain(scope)
        relevant = sorted(
            (a for s in chain for a in assigns_by_scope.get(s, [])),
            key=lambda a: a.lineno,
        )
        env: dict[str, str] = {}
        for a in relevant:
            if a.lineno > call.lineno:
                break
            cls = _classify(a.value, env)
            for tgt in a.targets:
                if isinstance(tgt, ast.Name):
                    env[tgt.id] = cls
        if _classify(call.args[0], env) == "scaling":
            fname = scope.name if isinstance(scope, _FUNC_TYPES) else "<module>"
            argtxt = ast.unparse(call.args[0])
            violations.append(
                (path, call.lineno, f"{fname}: F.broadcast({argtxt})")
            )
    return violations


# Bounded-by-semantics legs the AST classifier cannot see; each hint's
# build side has a FIXED row bound independent of SF, so the hint is
# safe at any scale. Keyed by (function name, exact hint-argument text)
# — round-10 advisor finding: a name-only waiver would silently bless
# any FUTURE hint added to the same function, including a scaling one.
ALLOWED_BOUNDED: dict[tuple[str, str], str] = {
    ("q_tail_index", "thr"): (
        "rows at rank exactly 101 of a per-segment row_number window "
        "-> <= |segments| (5) rows regardless of SF"
    ),
    ("q_kmeans_step", "cdims"): (
        "the 4 hash-selected seed vectors equi-joined to their dims "
        "-> <= 4 x n_dims rows regardless of SF"
    ),
    ("q_embed_pq", "cb"): (
        "per-(subspace, code) centroid table -> <= n_sub x 16 rows "
        "regardless of SF"
    ),
    ("q_embed_pq", "cdims"): (
        "the hash-selected seed codewords x subspace dims -> fixed rows"
    ),
    # --- grouped aggregates over SCHEMA-bounded keys (round-11 audit of
    # the tightened classifier's 66 hits: every entry below groups a
    # scaling table on a key whose cardinality the schema fixes) ---
    ("q_minhash_band_tuning", "hist"): "per-similarity-bucket, 10 rows",
    ("q_dup_transitivity", "ne"): "per-lang counts, <= 5 rows",
    ("overall", "acc"): (
        "q_markov_attribution inner fn: per-event-type absorption "
        "vector, <= |types| rows"
    ),
    ("q_nation_trade_balance", "sup"): "per-nationkey, <= 25 rows",
    ("q_nation_trade_balance", "dem"): "per-nationkey, <= 25 rows",
    ("q_embed_centroid_sim", "qa"): "per-label centroid dims, 10 x D rows",
    ("q_embed_centroid_sim", "qb"): "per-label centroid dims, 10 x D rows",
    ("q_dow_stability", "corpus"): "per-dow, 7 rows",
    ("q_monthly_seasonality", "t"): "per-segment totals, 5 rows",
    ("q_ingest_mix_drift", "t"): "per-half totals, 2 rows",
    ("q_agg_mad", "med"): "per-event-type medians, <= 5 rows",
    ("q_chi_square", "rt"): "per-orderstatus, 3 rows",
    ("q_chi_square", "ct"): "per-orderpriority, 5 rows",
    ("q_skyline", "frontier_sizes"): "per-p_size frontier, <= 50 rows",
    ("q_target_encode", "stats"): "per-brand, 25 rows",
    ("q_minmax_scale", "bounds"): "per-returnflag, 3 rows",
    ("q_doc_len_filter", "bounds"): "per-lang, 5 rows",
    ("q_mutual_info", "px"): "per-event-type marginal, 5 rows",
    ("q_mutual_info", "py"): "per-dow marginal, 7 rows",
    ("q_zorder_skipping", "rows_match"): "3 probe rectangles",
    ("q_cusum_changepoint", "stats"): "per-event-type, 5 rows",
    ("q_anomaly_mad", "med"): "per-event-type, 5 rows",
    ("q_anomaly_mad", "mad"): "per-event-type, 5 rows",
    ("q_runs_test", "med"): "per-year, calendar-bounded",
    ("q_user_overlap", "na_a"): "per-event-type, 5 rows",
    ("q_user_overlap", "na_b"): "per-event-type, 5 rows",
    ("q_customer_migration", "totals"): "per-year, calendar-bounded",
    ("q_brand_price_median", "counts"): "per-brand, 25 rows",
    ("q_brand_price_median", "stats"): "per-brand, 25 rows",
    ("q_transition_median", "counts"): "event-type pairs, <= 25 rows",
    ("q_rolling_distinct", "days"): (
        "day-grain aggregate: bounded by the calendar span, not SF"
    ),
    ("q_embed_quantize", "s"): "per-label, 10 rows",
    ("q_pca_power", "v1"): "per-dim, D rows",
    ("q_pca_power", "diag"): "per-dim, D rows",
    ("q_cohort_ltv", "csize"): "per-cohort-year, calendar-bounded",
    ("q_markov_loglik", "probs"): "event-type transition pairs, <= 25",
    ("q_quantile_normalize", "totals"): "per-lang, 5 rows",
    ("q_source_overlap", "pair"): "source pairs, <= 400 rows",
    ("q_jsd_sources", "ta"): "per-source, 20 rows",
    ("q_jsd_sources", "tb"): "per-source, 20 rows",
    ("q_silhouette_lite", "cs"): "per-label, 10 rows",
    ("q_silhouette_lite", "cn"): "per-label, 10 rows",
    ("q_silhouette_lite", "css"): "per-label, 10 rows",
    ("q_histogram_equidepth", "totals"): "per-returnflag, 3 rows",
    ("q_stl_outliers", "med"): "per-dow, 7 rows",
    ("q_stl_outliers", "mad"): "per-dow, 7 rows",
    ("q_pca_project", "c"): "per-dim, D rows",
    ("q_bloom_prefilter", "pos"): (
        "distinct bloom bit positions, <= 65536 (the filter's m)"
    ),
    ("q_skew_audit", "tot"): "per-family totals, fixed family set",
    ("q_profile_drift", "b"): "half-profile stats, 2 x features rows",
    ("q_assoc_rules", "na"): "per-brand, 25 rows",
    ("q_assoc_rules", "nc"): "per-brand, 25 rows",
    ("q_backfill_detect", "pm"): "day-grain, calendar-bounded",
    ("q_absorption_prob", "acc"): "per-event-type, <= 5 rows",
    ("q_lang_vocab_overlap", "sa"): "per-lang vocab sizes, 5 rows",
    ("q_lang_vocab_overlap", "sb"): "per-lang vocab sizes, 5 rows",
}


def _waived(desc: str) -> bool:
    fname, _, rest = desc.partition(": F.broadcast(")
    argtxt = rest[:-1] if rest.endswith(")") else rest
    return (fname, argtxt) in ALLOWED_BOUNDED


def lint_tree(root: str) -> list[tuple[str, int, str]]:
    out: list[tuple[str, int, str]] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as fh:
                src = fh.read()
            out.extend(v for v in lint_source(src, path) if not _waived(v[2]))
    return sorted(out)


def main() -> int:
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mapreduce_llm_spark",
    )
    violations = lint_tree(root)
    for path, line, desc in violations:
        print(f"{path}:{line} {desc}")
    print(f"{len(violations)} scaling-table broadcast hint(s)")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
