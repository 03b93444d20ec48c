"""Randomized/adversarial property checks for the round-4c rewrites.

The fixed-testdata oracle run proves each query once; these feed
CRAFTED data at the semantics' edges — dominance ties for the skyline
sweep, rows exactly on the cutoff for the incremental-join algebra —
plus seeded random corpora, and require the Spark rewrite to keep
hash-matching its independent oracle formulation (quadratic
NOT-EXISTS / full recompute) on every one.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_llm_spark import registry
from tests.oracle_harness import compare

registry.load_all()


def _write_part(path: str, rows: list[tuple[int, int, float]]) -> None:
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": pa.array([f"part{r[0]}" for r in rows], pa.string()),
                "p_brand": pa.array(["b" for _ in rows], pa.string()),
                "p_type": pa.array(["t" for _ in rows], pa.string()),
                "p_size": pa.array([r[1] for r in rows], pa.int32()),
                "p_retailprice": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        path,
    )


def _check(spark, tmpdir: str, name: str) -> None:
    con = duckdb.connect()
    for t in ("part", "orders", "lineitem"):
        f = os.path.join(tmpdir, f"{t}.parquet")
        if os.path.exists(f):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    df = registry.QUERIES[name](spark, tmpdir)
    ok, msg = compare(df, con, registry.ORACLE[name], name)
    assert ok, msg


def test_skyline_dominance_ties(spark, tmp_path):
    """The hand-built frontier edge cases: equal price at different
    sizes (larger size dominates — equality must LOSE the sweep),
    equal size at different prices (cheaper dominates), exact
    duplicates on both dims (mutually non-dominated, both survive),
    and a strictly dominated interior point."""
    rows = [
        (1, 10, 100.0),  # frontier
        (2, 20, 100.0),  # same price, larger size -> dominates partkey 1
        (3, 20, 120.0),  # same size as 2, pricier -> dominated
        (4, 30, 150.0),  # frontier (largest size)
        (5, 30, 150.0),  # exact duplicate of 4 -> both survive
        (6, 5, 90.0),    # frontier (cheapest)
        (7, 4, 95.0),    # dominated by 6 on both dims
    ]
    _write_part(os.path.join(tmp_path, "part.parquet"), rows)
    _check(spark, str(tmp_path), "q_skyline")


def test_skyline_random_corpora(spark, tmp_path):
    """Seeded random (size, price) clouds, with coarse price
    quantization so cross-size price ties actually occur."""
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n = 400
        rows = [
            (
                i,
                int(rng.randint(1, 51)),
                float(rng.randint(20, 200) * 5.0),
            )
            for i in range(n)
        ]
        d = os.path.join(tmp_path, f"s{seed}")
        os.makedirs(d, exist_ok=True)
        _write_part(os.path.join(d, "part.parquet"), rows)
        _check(spark, d, "q_skyline")


def _write_orders_lineitem(
    path: str, rng: np.random.RandomState, n_orders: int, cutoff: dt.datetime
) -> None:
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    o_rows, l_rows = [], []
    for ok_ in range(n_orders):
        # order dates clustered around the cutoff, INCLUDING exact hits
        delta = int(rng.randint(-40, 41))
        odate = cutoff + dt.timedelta(days=delta)
        if rng.rand() < 0.1:
            odate = cutoff  # exactly on the boundary: must land in delta (>=)
        o_rows.append((ok_, prios[ok_ % 3], odate))
        for li in range(int(rng.randint(0, 4))):
            sdate = odate + dt.timedelta(days=int(rng.randint(0, 60)))
            if rng.rand() < 0.1:
                sdate = cutoff
            l_rows.append(
                (ok_, sdate, float(rng.randint(100, 10000)) / 10.0, 0.05)
            )
    # a lineitem whose order does not exist (FK violation: inner join drops)
    l_rows.append((n_orders + 7, cutoff, 500.0, 0.0))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in o_rows], pa.int64()),
                "o_custkey": pa.array([0 for _ in o_rows], pa.int64()),
                "o_orderstatus": pa.array(["O" for _ in o_rows], pa.string()),
                "o_totalprice": pa.array([1.0 for _ in o_rows], pa.float64()),
                "o_orderdate": pa.array(
                    [r[2] for r in o_rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([r[1] for r in o_rows], pa.string()),
            }
        ),
        os.path.join(path, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in l_rows], pa.int64()),
                "l_shipdate": pa.array([r[1] for r in l_rows], pa.timestamp("us")),
                "l_extendedprice": pa.array([r[2] for r in l_rows], pa.float64()),
                "l_discount": pa.array([r[3] for r in l_rows], pa.float64()),
            }
        ),
        os.path.join(path, "lineitem.parquet"),
    )


def test_join_incremental_boundary_and_random_splits(spark, tmp_path):
    """The four-term old/delta decomposition must equal full recompute
    on corpora where rows land EXACTLY on the cutoff timestamp (the
    strict-</>= split must be airtight), orders have zero lineitems,
    and a lineitem references a missing order."""
    cutoff = dt.datetime(1996, 10, 1)
    for seed in (0, 1):
        d = os.path.join(tmp_path, f"s{seed}")
        os.makedirs(d, exist_ok=True)
        _write_orders_lineitem(d, np.random.RandomState(seed), 300, cutoff)
        _check(spark, d, "q_join_incremental")
