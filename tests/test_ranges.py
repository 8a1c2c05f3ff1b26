"""Range join (operators/ranges.py): equality with the naive theta join on
adversarial intervals, exact boundary semantics, and the no-nested-loop plan
guarantee the operator exists to provide."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.operators.ranges import (
    range_count,
    range_join,
)


def _points(spark):
    # ordinates include negatives, bin-boundary values, and a far outlier
    vals = [-5000, -1, 0, 1, 63, 64, 65, 100, 4095, 4096, 5000,
            12_345, 99_999, 1_000_000] + list(range(200, 1200, 37))
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "pid int, x long")


def _intervals(spark):
    # spans from 0 (degenerate single-point) through 10^6 (forces multiple
    # grid levels at bin_size=64), overlapping, plus an empty (hi < lo) one
    rows = [
        (0, 0, 0),            # zero-span at origin
        (1, 64, 64),          # zero-span on a bin boundary
        (2, 1, 100),          # short
        (3, 60, 70),          # straddles a bin boundary
        (4, -10_000, -2),     # negative range
        (5, 200, 1100),       # medium, overlaps many points
        (6, 0, 1_000_000),    # huge: must climb to a coarse level
        (7, 500, 400),        # inverted: matches nothing
        (8, 4000, 5000),      # straddles level boundaries
    ]
    return spark.createDataFrame(rows, "iv_id int, lo long, hi long")


def _naive(points, intervals):
    return points.crossJoin(intervals).where(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))


def _pairs(df):
    return sorted((r.pid, r.iv_id) for r in df.select("pid", "iv_id").collect())


def test_range_join_matches_naive_theta_join(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = range_join(pts, ivs, "x", "lo", "hi", bin_size=64)
    want = _pairs(_naive(pts, ivs))
    assert _pairs(got) == want
    assert len(want) > 20  # the fixture genuinely exercises matches
    # duplicate-free by construction: one (level, bin) meeting cell per pair
    assert got.count() == len(set(want)) == len(want)


def test_range_join_keyed(spark):
    pts = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 50), ("b", 3, 5), ("b", 4, 500)],
        "k string, pid int, x long")
    ivs = spark.createDataFrame(
        [("a", 10, 0, 10), ("b", 11, 0, 10), ("b", 12, 400, 600)],
        "k string, iv_id int, lo long, hi long")
    got = range_join(pts, ivs, "x", "lo", "hi", keys=["k"], bin_size=8)
    assert _pairs(got) == [(1, 10), (3, 11), (4, 12)]  # no cross-key matches


def test_range_count_rollup(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = {
        r.iv_id: (r.n_points, r.min_point, r.max_point)
        for r in range_count(pts, ivs, "x", "lo", "hi",
                             iv_id_cols=["iv_id"], bin_size=64).collect()
    }
    want = {
        r.iv_id: (r.n, r.mn, r.mx)
        for r in _naive(pts, ivs).groupBy("iv_id")
        .agg(F.count("*").alias("n"), F.min("x").alias("mn"),
             F.max("x").alias("mx")).collect()
    }
    assert got == want
    assert 7 not in got  # inverted interval matched nothing


def test_plan_has_no_nested_loop(spark):
    pts, ivs = _points(spark), _intervals(spark)
    plan = range_join(pts, ivs, "x", "lo", "hi", bin_size=64)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" in plan  # it is a real equi-join, not a filter rewrite


def test_empty_intervals_and_clash_guard(spark):
    pts = _points(spark)
    empty = _intervals(spark).limit(0)
    out = range_join(pts, empty, "x", "lo", "hi", bin_size=64)
    assert out.count() == 0
    assert set(out.columns) == {"pid", "x", "iv_id", "lo", "hi"}
    with pytest.raises(ValueError, match="clash"):
        range_join(pts, _intervals(spark).withColumnRenamed("iv_id", "x"),
                   "x", "lo", "hi")
