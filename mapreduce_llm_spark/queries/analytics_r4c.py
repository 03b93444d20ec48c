"""Round-4c surface widening: information-theoretic profiling
(entropy/Gini), categorical independence testing (chi-square +
Cramér's V), rolling exact medians, Pareto-frontier (skyline)
extraction, and BFS shortest-hop distances over the co-purchase
graph.

These close out the "understand the corpus" toolbox a curation
pipeline runs before mixing data: how concentrated is a label
distribution (entropy), are two categorical facets independent
(chi-square — the hypothesis-test complement of q_dist_drift's PSI),
robust local smoothing (rolling median), which records are
non-dominated under competing objectives (skyline — quality vs cost
trade-off curves), and how far apart items sit in the co-occurrence
graph (BFS — the hop-distance complement of q_graph_components'
reachability and q_graph_triangles' density).

Oracle discipline per CLAUDE.md: identical aliases both sides,
4-decimal rounding on float aggregates, BIGINT pins where DuckDB
widens to HUGEINT, `+ 0.0` where a rounded value can reach -0.0,
deterministic tie-breaks on every window/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_agg_entropy",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_cell
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    ), probs AS (
        SELECT o_orderstatus, n_cell,
               n_cell * 1.0 / sum(n_cell) OVER (PARTITION BY o_orderstatus) AS p
        FROM cells
    )
    SELECT o_orderstatus,
           CAST(sum(n_cell) AS BIGINT)            AS n_orders,
           round(-sum(p * log2(p)) + 0.0, 4)      AS entropy_bits,
           round(1.0 - sum(p * p), 4)             AS gini
    FROM probs
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity of the order-priority
    distribution within each order status — the label-concentration
    profile a mixing pipeline reads before reweighting sources.

    Shape: one map-side-combinable groupBy collapses 100 TB of orders
    to |status|×|priority| cells (~15 rows); the normalizing window and
    the final per-status fold run entirely on that tiny cell table, so
    scale cost is exactly one aggregation shuffle of grouped counts.
    The `+ 0.0` on the oracle's entropy guards the p=1 degenerate
    group, where -sum(p*log2 p) is -0.0 in DuckDB but +0.0 out of
    Spark's BigDecimal round (CLAUDE.md negative-zero rule)."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    w = Window.partitionBy("o_orderstatus")
    probs = cells.withColumn("p", F.col("n_cell") / F.sum("n_cell").over(w))
    return (
        probs.groupBy("o_orderstatus")
        .agg(
            F.sum("n_cell").alias("n_orders"),
            F.round(-F.sum(F.col("p") * F.log2("p")), 4).alias("entropy_bits"),
            F.round(1.0 - F.sum(F.col("p") * F.col("p")), 4).alias("gini"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_chi_square",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_cell
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    ), rt AS (
        SELECT o_orderstatus, sum(n_cell) AS n_row FROM cells GROUP BY o_orderstatus
    ), ct AS (
        SELECT o_orderpriority, sum(n_cell) AS n_col FROM cells GROUP BY o_orderpriority
    ), tot AS (
        SELECT sum(n_cell) AS n_tot,
               count(DISTINCT o_orderstatus)   AS r,
               count(DISTINCT o_orderpriority) AS c
        FROM cells
    ), terms AS (
        SELECT n_cell,
               n_row * 1.0 * n_col / n_tot AS expected
        FROM cells
        JOIN rt USING (o_orderstatus)
        JOIN ct USING (o_orderpriority)
        CROSS JOIN tot
    )
    SELECT CAST(n_tot AS BIGINT)                                  AS n_tot,
           CAST((r - 1) * (c - 1) AS BIGINT)                      AS dof,
           round(sum((n_cell - expected) * (n_cell - expected)
                     / expected), 4)                              AS chi2,
           round(sqrt(sum((n_cell - expected) * (n_cell - expected)
                          / expected)
                      / (n_tot * least(r - 1, c - 1))), 4)        AS cramers_v
    FROM terms CROSS JOIN tot
    GROUP BY n_tot, r, c
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order status and
    order priority, plus Cramér's V effect size — the categorical
    counterpart of q_dist_drift's PSI (PSI measures shift between two
    snapshots; chi-square tests association between two facets of one
    snapshot).

    Shape: one grouped count collapses the fact table to the r×c
    contingency cells; row totals, column totals, and the grand total
    are re-aggregations of those ~15 rows, joined back broadcast. The
    cell table feeds four consumers, so it is localCheckpointed once
    (the q_graph_triangles materialize-once contract) rather than
    recomputing the full-table aggregation per leg. Only the 1-row
    grand-total leg is a cross join (allowlisted broadcast scalar)."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_cell"))
        .localCheckpoint(eager=True)
    )
    rt = cells.groupBy("o_orderstatus").agg(F.sum("n_cell").alias("n_row"))
    ct = cells.groupBy("o_orderpriority").agg(F.sum("n_cell").alias("n_col"))
    tot = cells.agg(
        F.sum("n_cell").alias("n_tot"),
        F.countDistinct("o_orderstatus").alias("r"),
        F.countDistinct("o_orderpriority").alias("c"),
    )
    terms = (
        cells.join(F.broadcast(rt), "o_orderstatus")
        .join(F.broadcast(ct), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .withColumn("expected", F.col("n_row") * 1.0 * F.col("n_col") / F.col("n_tot"))
        .withColumn(
            "term",
            (F.col("n_cell") - F.col("expected"))
            * (F.col("n_cell") - F.col("expected"))
            / F.col("expected"),
        )
    )
    return terms.groupBy("n_tot", "r", "c").agg(
        F.round(F.sum("term"), 4).alias("chi2"),
        F.round(
            F.sqrt(F.sum("term") / (F.col("n_tot") * F.least(F.col("r") - 1, F.col("c") - 1))),
            4,
        ).alias("cramers_v"),
    ).select(
        F.col("n_tot").cast("bigint").alias("n_tot"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        "chi2",
        "cramers_v",
    )


@query(
    "q_win_median",
    oracle="""
    SELECT event_id, user_id,
           round(value, 4) + 0.0 AS value,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) + 0.0
               AS roll_med
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median (11-point trailing window) per user stream
    — robust smoothing that survives the outliers a rolling mean
    absorbs; the window complement of q_agg_mad's grouped robust
    statistics.

    Shape: one shuffle on user_id, then a bounded ROWS frame evaluated
    within each partition — per-key state is 11 values regardless of
    stream length, so the operator scales with the user_id shuffle
    exactly like sessionization. Spark's `median`/`percentile`
    aggregates reject window frames (INVALID_WINDOW_SPEC_FOR_
    AGGREGATION_FUNC), so the frame is materialized explicitly:
    collect_list over the bounded frame (11 doubles), array_sort, and
    the even/odd interpolation as array expressions — all JVM-side,
    O(w log w) per row with w=11, matching DuckDB's interpolating
    median bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    # empty-frame guard: collect_list drops NULLs, so an all-NULL frame
    # yields an empty array where mid_lo's index is 0 and element_at
    # raises. DuckDB's median over an all-NULL frame is NULL — emitting
    # NULL keeps the oracle hash stable if testdata ever drifts NULLs
    # in (same hardening as q_win_running_distinct).
    med = F.when(n > 0, F.round((mid_lo + mid_hi) / 2.0, 4))
    # round-15 NON-adoption: the trailing global sort's range-boundary
    # sampling pass re-evaluates this window a second time, and a lazy
    # localCheckpoint under the orderBy (materialize once, sample from
    # blocks) measured 0.59x under heavy host contention — but a
    # consistent ~1.05x LOSS on a quiet host (9-pass in-session A/B,
    # anchors 0.31/0.34): the 11-point frame is cheap enough that the
    # block write/rescan outweighs its re-evaluation. Left on the
    # direct plan per the adopt-only-demonstrated-wins rule; the same
    # barrier swept 0.96-1.05x (noise) across 18 re-screened headline
    # candidates (OPTIMIZATION_r15.md).
    return (
        e.select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            med.alias("roll_med"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_win_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(len(list_distinct(list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))) AS INT)
               AS n_distinct_types
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_win_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a sliding window — behavioral diversity of
    each user's trailing 20 events. Neither engine supports
    count(DISTINCT) OVER natively, so both sides materialize the
    bounded frame as a list and deduplicate it (collect_list →
    array_distinct → size here; list → list_distinct → len in the
    oracle) — the hash match pins that the two rewrites agree.

    Shape: one shuffle on user_id; per-row state is the 20-element
    frame, so cost scales with the shuffle exactly like q_win_median.
    An unbounded variant would instead use the running-set trick (rank
    of first occurrence ≤ current row), which stays O(1) per row."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.size(F.array_distinct(F.collect_list("event_type").over(w)))
            .cast("int")
            .alias("n_distinct_types"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_win_running_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(len(list_distinct(list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS INT)
               AS n_types_seen
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED running distinct count — how many distinct event
    types each user has touched so far. This is the scale path
    q_win_distinct's docstring promises: the oracle materializes the
    whole unbounded frame as a list per row (O(n) state — fine for an
    oracle, fatal at 100 TB), while the Spark side is the
    first-occurrence rewrite: flag each (user, type)'s first event via
    row_number()==1, then a running SUM of flags — O(1) state per row,
    plain cumulative sum. The hash match proves the rewrite against
    the independent quadratic-state formulation, exactly like
    q_skyline's NOT-EXISTS proof.

    Two exchanges (the flag window keys on (user_id, event_type), the
    running sum on user_id); at any scale both are ordinary
    shuffle-window passes with bounded per-row state
    [pinned: test_running_distinct_is_two_window_rewrite]. NULL
    event_types are excluded from the count on BOTH sides (DuckDB's
    list_distinct drops NULLs; the flag is masked with isNotNull so a
    future testdata snapshot with NULL types can't hash-diverge)."""
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn(
            "_first",
            (
                (F.row_number().over(w_first) == 1)
                & F.col("event_type").isNotNull()
            ).cast("int"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("_first").over(w_run).cast("int").alias("n_types_seen"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_skyline",
    oracle="""
    SELECT a.p_partkey, a.p_size, round(a.p_retailprice, 4) AS p_retailprice
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY a.p_size DESC, a.p_partkey
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over parts: minimize retail price,
    maximize size — the non-dominated set a cost/quality trade-off scan
    returns. A part survives iff no other part is at least as good on
    both axes and strictly better on one; equal-on-both ties are
    mutually non-dominating and all survive.

    The oracle states the quadratic NOT-EXISTS definition directly; the
    Spark plan is the O(n) sweep rewrite, so the hash match proves the
    rewrite: (1) group to min-price-per-size — parts above their size's
    min price are dominated within the size class; (2) running min of
    price over strictly-larger sizes on the ≤|size-domain| grouped rows
    (bounded domain ⇒ the sweep table is tiny; the pmod partition trick
    from operators/ranking.py keeps the window warning-free); a size
    class survives iff its min price undercuts every larger size
    strictly — equality loses, because the larger-size part at the same
    price dominates; (3) broadcast the surviving (size, min_price)
    pairs back as a semi-filter join. At 100 TB the full-table work is
    one map-side-combinable groupBy on size plus one broadcast hash
    join — no pairwise comparison anywhere."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    by_size = p.groupBy("p_size").agg(F.min("p_retailprice").alias("min_price"))
    sweep_w = (
        Window.partitionBy(F.pmod(F.col("p_size"), F.lit(1)))
        .orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_sizes = (
        by_size.withColumn("best_larger", F.min("min_price").over(sweep_w))
        .where(
            F.col("best_larger").isNull()
            | (F.col("min_price") < F.col("best_larger"))
        )
        .select(
            F.col("p_size").alias("fs_size"), F.col("min_price").alias("fs_price")
        )
    )
    return (
        p.join(
            F.broadcast(frontier_sizes),
            (F.col("p_size") == F.col("fs_size"))
            & (F.col("p_retailprice") == F.col("fs_price")),
        )
        .select(
            "p_partkey",
            "p_size",
            F.round("p_retailprice", 4).alias("p_retailprice"),
        )
        .orderBy(F.col("p_size").desc(), "p_partkey")
    )


@query(
    "q_join_incremental",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                               AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2)))
                - sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                      * CAST(l_discount AS DECIMAL(18, 2)))
                AS VARCHAR)                                       AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN: with both sides split
    into old + delta at a date cutoff (A = orders on o_orderdate, B =
    lineitem on l_shipdate), the maintained view is the textbook
    four-term algebra

        A⋈B = A_old⋈B_old  ∪  ΔA⋈B_old  ∪  A_old⋈ΔB  ∪  ΔA⋈ΔB

    and the oracle is the full-recompute join, so the hash gate proves
    the decomposition exact — the join complement of
    q_rollup_incremental's aggregate-state merge. At 100 TB this is
    the difference between reprocessing the fact table nightly and
    touching only the delta partitions: A_old⋈B_old is the stored
    materialization (zero recompute), the two mixed terms prune the
    big side by the delta's key range and broadcast the (small)
    delta, and ΔA⋈ΔB is delta-sized. Here all four terms derive from
    the same scans, so Catalyst plans four hash joins over one
    exchange pair — the point is the algebra, pinned by equality."""
    cut = "1996-10-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o_old, o_new = (
        o.filter(F.col("o_orderdate") < F.lit(cut)),
        o.filter(F.col("o_orderdate") >= F.lit(cut)),
    )
    b_old, b_new = (
        li.filter(F.col("l_shipdate") < F.lit(cut)),
        li.filter(F.col("l_shipdate") >= F.lit(cut)),
    )
    terms = [
        o_old.join(b_old, o_old["o_orderkey"] == b_old["l_orderkey"]),
        o_new.join(b_old, o_new["o_orderkey"] == b_old["l_orderkey"]),
        o_old.join(b_new, o_old["o_orderkey"] == b_new["l_orderkey"]),
        o_new.join(b_new, o_new["o_orderkey"] == b_new["l_orderkey"]),
    ]
    maintained = terms[0]
    for t in terms[1:]:
        maintained = maintained.unionByName(t)
    # revenue sums on DecimalType and emits a string: sum(p) - sum(p*d)
    # is exact fixed-point on both engines, so the union order of the
    # four delta terms provably cannot perturb the result — which is
    # the whole claim (the sf0.1 sweep caught the double formulation
    # flipping in the 4th decimal with summation order).
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        maintained.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(price) - F.sum(price * disc)).cast("string").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_graph_bfs",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), oriented AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
        SELECT pa AS src, pb AS dst FROM oriented
        UNION ALL
        SELECT pb AS src, pa AS dst FROM oriented
    ), walk AS (
        SELECT (SELECT min(pa) FROM oriented) AS node, 0 AS hop
        UNION
        SELECT e.dst AS node, w.hop + 1 AS hop
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hop < 3
    )
    SELECT node AS p_partkey, CAST(min(hop) AS INT) AS hop
    FROM walk
    GROUP BY node
    ORDER BY hop, p_partkey
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-hop distances (≤3 hops) from the lowest-keyed part
    through the co-purchase graph — "how many baskets apart are two
    products". Complements q_graph_components (reachability) and
    q_hierarchy_depth (pointer doubling): BFS is the per-level frontier
    expansion whose distances pointer doubling cannot produce.

    The oracle is DuckDB's recursive CTE with UNION-distinct dedup +
    min(hop); the Spark side is the standard iterative frontier loop:
    each level joins the frontier against the edge list, dedups, and
    anti-joins already-settled vertices (first touch = minimal hop, so
    the anti-join IS the min() — no re-aggregation). Per level: one
    equi-join shuffle on src + one anti-join on node; the edge list is
    built once and localCheckpointed (it feeds every level — the
    q_graph_triangles materialize-once contract), and each frontier is
    checkpointed to stop the 3-join lineage stack. Seed = min(pa): the
    globally smallest vertex orders first in every oriented pair it
    touches, so min over pa is the graph minimum, computed as a 1-row
    aggregate joined in — no driver-side collect."""
    li = load_table(spark, sf_dir, "lineitem")
    # Unlike q_graph_triangles (which must count DISTINCT wedges), BFS
    # is insensitive to duplicate edges — each level's node-distinct
    # absorbs them — so the edge build skips BOTH dedup shuffles the
    # triangle query pays (items distinct + pair distinct); the only
    # shuffle is the self-join on l_orderkey (measured: ~1 s less at
    # sf0.1 for ~4% more edge rows).
    items = li.select("l_orderkey", "l_partkey")
    # SERIALIZED storage for the materialized edge list (storage only —
    # value-identical): the default deserialized-row cache of the
    # |lines|²-per-order pair set outgrew executor storage at sf10 and
    # the eviction/GC churn ran the second decade at exponent 1.246
    # (round-12 diagnosis); MEMORY_AND_DISK (serialized in PySpark)
    # packs ~2-4x tighter, stays resident, and re-measures at 0.84.
    # Round-14 optimization: the oriented pair MULTISET now comes from
    # ONE collect_list shuffle per order + in-task position-pair
    # expansion (least/greatest per i<j line pair, equal-part pairs
    # filtered) instead of the l_orderkey self-join — same multiset
    # (each unordered line pair with distinct parts contributes exactly
    # one (min, max) row in both forms; in-session A/B 4.5-5.5 → 3.0 s
    # at sf0.1). TPC-H orders are ≤7 lines, so the per-basket quadratic
    # is bounded; a mega-basket corpus would add the q_basket_pairs cap.
    oriented = (
        items.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "filter(transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(least(x, y) AS pa, greatest(x, y) AS pb)), "
                    "p -> p.pa <> p.pb)))"
                )
            ).alias("pair")
        )
        .select("pair.pa", "pair.pb")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    edges = oriented.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(oriented.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))

    # Round-14: the F.broadcast hints on the frontier/settled sets are
    # gone — they were the round-9 forced-broadcast class (frontier is
    # ≤|V|, i.e. SF-scaling; a hint OOMs at the 100 TB design point),
    # previously masked from the AST lint by a tuple-assignment blind
    # spot that this round's edge-build rewrite incidentally removed.
    # Instead each level is persisted + counted: the materialized
    # InMemoryRelation carries its TRUE sizeInBytes, so Catalyst picks
    # the broadcast itself while the frontier fits the threshold and
    # degrades to a shuffle join when it genuinely outgrows it —
    # statistics, not hints (in-session: all 3 levels still plan
    # BroadcastHashJoin with zero SortMergeJoin at sf0.1, ~hint-equal
    # time; the unhinted checkpoint form was ~1.3× slower because
    # LogicalRDD reports no stats and Catalyst sort-merged the edge
    # list every level). MEMORY_AND_DISK persists are serialized and
    # never evicted (the q_graph_bfs round-12 storage rule); block
    # lifetime matches the previous checkpoints' (ContextCleaner).
    seed = (
        oriented.agg(F.min("pa").alias("node"))
        .withColumn("hop", F.lit(0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed.count()
    dist = seed
    frontier = dist
    for level in range(1, 4):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(level))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        frontier.count()
        dist = dist.unionByName(frontier)
    return dist.select(
        F.col("node").alias("p_partkey"), F.col("hop").cast("int").alias("hop")
    ).orderBy("hop", "p_partkey")
