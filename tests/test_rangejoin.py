"""Binned range (interval) join: equivalence with the naive predicate
join, exact-once semantics across bin boundaries, left-join backfill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators.rangejoin import range_join


@pytest.fixture()
def points(spark):
    # points at 0.5 spacing incl. exact bin boundaries (w=10)
    return spark.createDataFrame(
        [(i, i * 0.5) for i in range(100)], "pid long, t double"
    )


@pytest.fixture()
def intervals(spark):
    # widths 1..25 (some spanning multiple w=10 bins), incl. empty (s==e)
    rows = [(j, j * 1.7, j * 1.7 + (j % 26)) for j in range(40)]
    return spark.createDataFrame(rows, "iid long, s double, e double")


def naive(points, intervals, how="inner"):
    return points.join(
        intervals,
        (F.col("s") <= F.col("t")) & (F.col("t") < F.col("e")),
        how,
    ).select("pid", "t", "iid", "s", "e")


def test_inner_matches_naive(points, intervals):
    got = range_join(points, intervals, "t", "s", "e", bin_width=10.0).select(
        "pid", "t", "iid", "s", "e"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive(points, intervals).collect())
    )


def test_no_duplicates_across_bins(points, intervals):
    """An interval spanning k bins must still match each point once."""
    got = range_join(points, intervals, "t", "s", "e", bin_width=2.0)
    pairs = [(r["pid"], r["iid"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs))


def test_left_join_backfills_unmatched(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 100.0)], "pid long, t double"
    )
    iv = spark.createDataFrame([(7, 0.0, 10.0)], "iid long, s double, e double")
    rows = {
        r["pid"]: r["iid"]
        for r in range_join(
            pts, iv, "t", "s", "e", bin_width=10.0, how="left"
        ).collect()
    }
    assert rows == {1: 7, 2: None}


def test_equi_key_restricts_matches(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "pid long, k string, t double"
    )
    iv = spark.createDataFrame(
        [(7, "a", 0.0, 10.0)], "iid long, k string, s double, e double"
    )
    got = range_join(pts, iv, "t", "s", "e", bin_width=10.0, on="k").collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 7)]


def test_rejects_unsupported_how(spark):
    pts = spark.createDataFrame([(1, 5.0)], "pid long, t double")
    iv = spark.createDataFrame([(7, 0.0, 10.0)], "iid long, s double, e double")
    with pytest.raises(ValueError):
        range_join(pts, iv, "t", "s", "e", bin_width=10.0, how="full")
