"""Z-order clustering operator (operators/zorder.py) and its declared
query: exact Morton-interleave parity with a Python bit-reference,
grid-scaling edge behavior, and the layout-superiority property the
q_zorder_skipping numbers exist to demonstrate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_llm_spark import registry
from mapreduce_llm_spark.operators.zorder import scale_to_bits, z_value
from mapreduce_llm_spark.registry import QUERIES
from tests.conftest import SMOKE_SF_DIR

registry.load_all()


def _z_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_bit_reference(spark):
    pts = [
        (0, 0),
        (1, 0),
        (0, 1),
        (5, 9),
        (1023, 1),
        (16383, 16383),
        (12345, 6789),
    ]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", z_value(F.col("x"), F.col("y"), 14)
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == _z_ref(x, y, 14), (x, y)


def test_z_value_locality_is_rectangular(spark):
    """Fixing the top bits of z confines BOTH coordinates to one grid
    cell — the property file footprints inherit."""
    import itertools

    pts = [(x, y) for x, y in itertools.product(range(0, 64, 7), repeat=2)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", F.shiftright(z_value(F.col("x"), F.col("y"), 6), 8).alias("cell")
    )
    for row in (
        df.groupBy("cell")
        .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
        .collect()
    ):
        # top 4 of 12 z-bits fixed -> 2 bits per axis fixed -> each
        # axis confined to one of 4 sixteen-wide cells
        assert row["max(x)"] - row["min(x)"] < 16
        assert row["max(y)"] - row["min(y)"] < 16


def test_scale_to_bits_clamps_and_spans(spark):
    df = spark.createDataFrame(
        [(0,), (50,), (100,)], "v long"
    ).select(
        scale_to_bits(F.col("v"), 0, 100, 8).alias("g")
    )
    got = [r["g"] for r in df.collect()]
    assert got[0] == 0
    assert 0 < got[1] < 255
    assert got[2] == 255


def test_zorder_query_releases_its_cache(spark):
    """The grid persist inside q_zorder_skipping must not leak into
    the session's cache manager (the q_dedup_fuzzy standard: eager
    materialize, unpersist before returning)."""
    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    df = QUERIES["q_zorder_skipping"](spark, SMOKE_SF_DIR)
    df.count()
    assert cache_mgr.isEmpty(), "q_zorder_skipping left a cached plan behind"


def test_zorder_skipping_superiority(spark):
    rows = QUERIES["q_zorder_skipping"](spark, SMOKE_SF_DIR).collect()
    by = {(r["probe"], r["layout"]): r for r in rows}
    # the date-only slice is the headline: a linear custkey layout has
    # every file spanning all dates (touches ~all), z-order confines
    # dates to 8 of 64 grid cells
    assert (
        by[("date_slice", "zorder")]["n_files_touched"]
        < by[("date_slice", "linear")]["n_files_touched"]
    )
    # small rectangle on both dims: z-order at least as good
    assert (
        by[("square", "zorder")]["n_files_touched"]
        <= by[("square", "linear")]["n_files_touched"]
    )
    # the selected row count is layout-invariant (shared leg)
    for probe in ("date_slice", "custkey_slice", "square"):
        assert (
            by[(probe, "zorder")]["n_rows_match"]
            == by[(probe, "linear")]["n_rows_match"]
        )
        # rows in touched files always cover the matching rows
        for layout in ("zorder", "linear"):
            r = by[(probe, layout)]
            assert r["n_rows_in_touched"] >= r["n_rows_match"]
