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
``load_table(..., <scaling table>)`` through non-reducing ops only
(select/filter/withColumn/join/...). An aggregation (``.agg``,
``.distinct``, ``.limit``, ``.dropDuplicates``, ``.summary``) resets
the leg to bounded — those hints are the legitimate 1-row/tiny-grid
class and stay.

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
}

# Methods that bound the output regardless of input scale.
_REDUCING = {"agg", "limit", "distinct", "dropDuplicates", "summary", "describe"}

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
            # unknown method (incl. groupBy→agg handled by the agg case)
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
    """Return [(path, lineno, description)] for every scaling-leg hint."""
    tree = ast.parse(src)
    violations: list[tuple[str, int, str]] = []
    for fndef in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        assigns: list[ast.Assign] = []
        calls: list[ast.Call] = []
        for sub in ast.walk(fndef):
            if isinstance(sub, ast.Assign):
                assigns.append(sub)
            elif isinstance(sub, ast.Call) and _is_broadcast_call(sub):
                calls.append(sub)
        if not calls:
            continue
        assigns.sort(key=lambda a: a.lineno)
        for call in sorted(calls, key=lambda c: c.lineno):
            env: dict[str, str] = {}
            for a in assigns:
                if a.lineno > call.lineno:
                    break
                cls = _classify(a.value, env)
                for tgt in a.targets:
                    if isinstance(tgt, ast.Name):
                        env[tgt.id] = cls
            if not call.args:
                continue
            if _classify(call.args[0], env) == "scaling":
                argtxt = ast.unparse(call.args[0])
                violations.append(
                    (path, call.lineno, f"{fndef.name}: F.broadcast({argtxt})")
                )
    return violations


# Bounded-by-semantics legs the AST classifier cannot see; each hint's
# build side has a FIXED row bound independent of SF, so the hint is
# safe at any scale. Keyed by function name; reviewed per entry.
ALLOWED_BOUNDED = {
    # thr = rows at rank exactly 101 of a per-segment row_number window
    # → ≤ |segments| (5) rows regardless of SF.
    "q_tail_index",
    # cdims = the 4 hash-selected seed vectors equi-joined to their
    # dims → ≤ 4 × n_dims rows regardless of SF.
    "q_kmeans_step",
    "q_embed_pq",
}


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
            out.extend(
                v
                for v in lint_source(src, path)
                if v[2].split(":", 1)[0] not in ALLOWED_BOUNDED
            )
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
