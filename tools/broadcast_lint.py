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

PARAMETER TRACING (closes the round-9-class blind spot, VERDICT r11
item 5): a DataFrame arriving as a FUNCTION PARAMETER is no longer
skipped. Pass 1 tags every function parameter and records which
parameters' tags reach a ``F.broadcast`` argument inside their
function ("broadcast-sensitive" parameters). Pass 2 walks every call
site in the tree, binds arguments to the callee's parameters (by
position and keyword, matched on the callee's bare name), and flags
any call that feeds a SCALING expression into a broadcast-sensitive
parameter — at the CALL SITE, where the caller knows the real
cardinality. Sensitivity propagates transitively (a wrapper passing
its own parameter through to a sensitive callee becomes sensitive
itself, to a fixpoint across the whole tree). Residual limits: bare-
name callee matching (two same-named functions share sensitivity) and
no tracing through containers/closures — both conservative, and the
runtime plan lint (tests/test_plan_lint.py) remains the backstop.

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
                # a parameter tag survives passthrough ops (and joins
                # against bounded legs): broadcast(param.select(...))
                # must still resolve to the parameter
                tags = [
                    c for c in (base, *arg_cls) if c.startswith("param::")
                ]
                if tags:
                    return tags[0]
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


def _param_tag(fname: str, param: str) -> str:
    return f"param::{fname}::{param}"


def _params_of(node: ast.AST) -> list[ast.arg]:
    a = node.args
    return list(a.posonlyargs) + list(a.args) + list(a.kwonlyargs)


class _Analysis:
    """Single-module AST pass: explicit scope map (round-10 advisor
    finding — module-level code and async functions are checked, nested
    defs visited exactly once, each site resolving names against its
    own scope chain), per-site assignment envs seeded with parameter
    tags, direct scaling violations, broadcast-sensitive parameters,
    and call records for the cross-module pass-2."""

    def __init__(self, src: str, path: str = "<src>") -> None:
        self.path = path
        self.tree = tree = ast.parse(src)

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
        self.scope_of = scope_of

        self.assigns_by_scope: dict[ast.AST, list[ast.Assign]] = {}
        self.bcasts: list[tuple[ast.Call, ast.AST]] = []
        self.calls: list[tuple[ast.Call, ast.AST]] = []
        #: bare function name -> every parameter-name list defined
        #: under that name in this module
        self.funcdefs: dict[str, list[list[str]]] = {}
        for node, scope in scope_of.items():
            if isinstance(node, ast.Assign):
                self.assigns_by_scope.setdefault(scope, []).append(node)
            elif isinstance(node, ast.Call):
                if _is_broadcast_call(node):
                    self.bcasts.append((node, scope))
                else:
                    self.calls.append((node, scope))
            if isinstance(node, _FUNC_TYPES):
                self.funcdefs.setdefault(node.name, []).append(
                    [a.arg for a in _params_of(node)]
                )

    def _chain(self, scope: ast.AST) -> list[ast.AST]:
        chain = [scope]
        while scope is not self.tree:
            scope = self.scope_of[scope]
            if isinstance(scope, _FUNC_TYPES) or scope is self.tree:
                chain.append(scope)
        return chain

    def env_at(self, site: ast.AST, scope: ast.AST) -> dict[str, str]:
        """Assignment env visible at ``site``: parameter tags of every
        enclosing function (outermost first, so inner shadows outer),
        then assignments in scope-chain lineno order up to the site."""
        chain = self._chain(scope)
        env: dict[str, str] = {}
        for s in reversed(chain):
            if isinstance(s, _FUNC_TYPES):
                for a in _params_of(s):
                    env[a.arg] = _param_tag(s.name, a.arg)
        relevant = sorted(
            (a for s in chain for a in self.assigns_by_scope.get(s, [])),
            key=lambda a: a.lineno,
        )
        for a in relevant:
            if a.lineno > site.lineno:
                break
            cls = _classify(a.value, env)
            for tgt in a.targets:
                if isinstance(tgt, ast.Name):
                    env[tgt.id] = cls
        return env

    def scan(self) -> tuple[list[tuple[str, int, str]], set[tuple[str, str]]]:
        """-> (direct scaling violations, broadcast-sensitive params)."""
        violations: list[tuple[str, int, str]] = []
        sensitive: set[tuple[str, str]] = set()
        for call, scope in sorted(self.bcasts, key=lambda c: c[0].lineno):
            if not call.args:
                continue
            env = self.env_at(call, scope)
            cls = _classify(call.args[0], env)
            fname = (
                scope.name if isinstance(scope, _FUNC_TYPES) else "<module>"
            )
            if cls == "scaling":
                argtxt = ast.unparse(call.args[0])
                violations.append(
                    (self.path, call.lineno, f"{fname}: F.broadcast({argtxt})")
                )
            elif cls.startswith("param::"):
                # a definition-site ALLOWED_BOUNDED waiver on the
                # broadcast argument (e.g. the ranking operators'
                # one-row-per-partition offsets leg) bounds the build
                # side for EVERY caller — no sensitivity to propagate
                argtxt = ast.unparse(call.args[0])
                if _waived(f"{fname}: F.broadcast({argtxt})"):
                    continue
                _, owner, param = cls.split("::", 2)
                sensitive.add((owner, param))
        return violations, sensitive

    def call_records(
        self, known: dict[str, list[list[str]]]
    ) -> list[dict]:
        """One record per (call site, bound parameter) for every call
        to a known function whose argument classifies as scaling or as
        a caller parameter tag (the only classes that can produce a
        violation or propagate sensitivity)."""
        out: list[dict] = []
        for call, scope in self.calls:
            fn = call.func
            name = fn.attr if isinstance(fn, ast.Attribute) else (
                fn.id if isinstance(fn, ast.Name) else None
            )
            if name is None or name not in known:
                continue
            env = self.env_at(call, scope)
            caller = (
                scope.name if isinstance(scope, _FUNC_TYPES) else "<module>"
            )
            seen: set[tuple[str, int]] = set()
            for params in known[name]:
                kw = {k.arg: k.value for k in call.keywords if k.arg}
                bindings = list(zip(params, call.args)) + [
                    (p, kw[p]) for p in params if p in kw
                ]
                for param, argnode in bindings:
                    if (param, argnode.lineno) in seen:
                        continue
                    seen.add((param, argnode.lineno))
                    cls = _classify(argnode, env)
                    if cls != "scaling" and not cls.startswith("param::"):
                        continue
                    out.append(
                        {
                            "callee": name,
                            "param": param,
                            "cls": cls,
                            "path": self.path,
                            "lineno": call.lineno,
                            "caller": caller,
                            "argtext": ast.unparse(argnode),
                        }
                    )
        return out


def lint_source(src: str, path: str = "<src>") -> list[tuple[str, int, str]]:
    """Direct (intra-module) scaling-leg hints of one module."""
    return _Analysis(src, path).scan()[0]


def lint_sources(
    modules: list[tuple[str, str]]
) -> list[tuple[str, int, str]]:
    """Tree-wide lint over [(src, path)]: direct violations plus
    call-site tracing of broadcast-sensitive parameters, sensitivity
    propagated transitively to a fixpoint."""
    analyses = [_Analysis(src, path) for src, path in modules]
    known: dict[str, list[list[str]]] = {}
    for a in analyses:
        for name, plists in a.funcdefs.items():
            known.setdefault(name, []).extend(plists)

    violations: list[tuple[str, int, str]] = []
    sensitive: set[tuple[str, str]] = set()
    records: list[dict] = []
    for a in analyses:
        direct, sens = a.scan()
        violations.extend(direct)
        sensitive |= sens
        records.extend(a.call_records(known))

    # transitive closure: a wrapper feeding its own parameter into a
    # sensitive callee parameter is itself sensitive
    changed = True
    while changed:
        changed = False
        for r in records:
            if (r["callee"], r["param"]) in sensitive and r[
                "cls"
            ].startswith("param::"):
                _, owner, p = r["cls"].split("::", 2)
                if (owner, p) not in sensitive:
                    sensitive.add((owner, p))
                    changed = True

    for r in records:
        if (r["callee"], r["param"]) in sensitive and r["cls"] == "scaling":
            violations.append(
                (
                    r["path"],
                    r["lineno"],
                    f"{r['caller']}: F.broadcast({r['argtext']})"
                    f" [via {r['callee']}({r['param']}=...)]",
                )
            )
    return sorted(violations)


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
    ("q_initial_letter_bias", "corpus"): (
        "per-word-initial-letter corpus marginal, <= 26 rows"
    ),
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
    # --- definition-site waivers for parameter-receiving operators
    # (round-12 call-site tracing): the broadcast leg is bounded by
    # CONSTRUCTION for every caller, so no sensitivity propagates ---
    ("global_row_number", "offsets"): (
        "prefix-summed per-partition counts: one row per physical "
        "partition (~|partitions|), independent of df's row count"
    ),
    ("partitioned_row_number", "offsets"): (
        "per-(partition, key) count frame, |keys| x |partitions| rows; "
        "the operator's documented contract restricts it to "
        "low-cardinality keys (high-cardinality callers use the plain "
        "keyed window instead)"
    ),
    ("global_prefix_sum", "offsets"): (
        "prefix-summed per-partition totals: one row per physical "
        "partition, independent of df's row count"
    ),
}


def _waived(desc: str) -> bool:
    fname, _, rest = desc.partition(": F.broadcast(")
    if ") [via " in rest:
        argtxt = rest.split(") [via ")[0]
    else:
        argtxt = rest[:-1] if rest.endswith(")") else rest
    return (fname, argtxt) in ALLOWED_BOUNDED


def lint_tree(root: str) -> list[tuple[str, int, str]]:
    modules: list[tuple[str, str]] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as fh:
                modules.append((fh.read(), path))
    return sorted(v for v in lint_sources(modules) if not _waived(v[2]))


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
