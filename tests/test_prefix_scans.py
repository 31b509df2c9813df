"""Tiled prefix scans (operators/prefix.py) vs the reference global
window, including multi-tile widths, sparse/negative keys, and the
no-partitionless-window plan property that motivated them."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkaconnect_spark.operators.prefix import (
    tiled_prefix_max_exclusive,
    tiled_prefix_sum,
)

ROWS = [
    # (key, a, b) — sparse keys crossing tile boundaries at width 3/4
    (-7, 5, 1),
    (-2, 3, 0),
    (0, 1, 2),
    (1, 4, 4),
    (3, 1, 1),
    (8, 2, 7),
    (9, 6, 0),
    (20, 1, 3),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "k long, a long, b long")


@pytest.mark.parametrize("width", [1, 3, 4, 100])
def test_prefix_sum_matches_global_window(frame, width):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["ca"], r["cb"])
        for r in frame.select(
            "k",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in tiled_prefix_sum(frame, "k", ["a", "b"], tile_width=width).collect()
    }
    assert got == want


@pytest.mark.parametrize("width", [1, 3, 4, 100])
def test_prefix_max_exclusive_matches_global_window(frame, width):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["m"]
        for r in frame.select("k", F.max("a").over(w).alias("m")).collect()
    }
    got = {
        r["k"]: r["prev"]
        for r in tiled_prefix_max_exclusive(
            frame, "k", "a", "prev", tile_width=width
        ).collect()
    }
    assert got == want
    # first key has no predecessor
    assert got[min(k for k, _, _ in ROWS)] is None


def test_no_partitionless_window_in_plan(frame):
    """The whole point: every windowspecdefinition in the tiled plan
    leads with a partition column (same detection rule as
    tools/plan_audit.py)."""
    import re

    for df in (
        tiled_prefix_sum(frame, "k", ["a"], tile_width=3),
        tiled_prefix_max_exclusive(frame, "k", "a", "prev", tile_width=3),
    ):
        plan = df._jdf.queryExecution().toString()
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            assert not re.match(r"^\s*\w+#\d+ (ASC|DESC)", m.group(1)), plan
        assert "CartesianProduct" not in plan


def test_preserves_other_columns(frame):
    out = tiled_prefix_sum(
        frame.withColumn("tag", F.concat(F.lit("x"), "k")), "k", ["a"]
    )
    assert {"k", "a", "b", "tag", "cum_a"} <= set(out.columns)
    assert "__tile" not in out.columns


def test_bad_tile_width(frame):
    with pytest.raises(ValueError):
        tiled_prefix_sum(frame, "k", ["a"], tile_width=0)


def test_pathological_tile_count_nested_level(spark):
    """Thousands of distinct tiles (small width over a wide sparse key
    range) — the case the r4 verdict flagged as quietly quadratic.
    The nested super-tile level keeps the triangular term on
    n_tiles / tile_width rows; correctness vs the global window."""
    keys = list(range(0, 30000, 7))  # ~4.3k rows, ~3.7k tiles at width 8
    df = spark.createDataFrame([(k, k % 13) for k in keys], "k long, a long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["c"]
        for r in df.select("k", F.sum("a").over(w).alias("c")).collect()
    }
    got = {
        r["k"]: r["cum_a"]
        for r in tiled_prefix_sum(df, "k", ["a"], tile_width=8).collect()
    }
    assert got == want

    wx = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want_m = {
        r["k"]: r["m"]
        for r in df.select("k", F.max("a").over(wx).alias("m")).collect()
    }
    got_m = {
        r["k"]: r["prev"]
        for r in tiled_prefix_max_exclusive(
            df, "k", "a", "prev", tile_width=8
        ).collect()
    }
    assert got_m == want_m
