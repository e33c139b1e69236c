"""As-of join operator (union + last-value carry)."""

from __future__ import annotations

import pytest

from tower_parse_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 15.0), (4, "c", 5.0)],
        "eid long, k string, t double",
    )
    right = spark.createDataFrame(
        [
            ("a", 5.0, 100),
            ("a", 10.0, 101),  # exact-time match counts ("at or before")
            ("a", 19.0, 102),
            ("b", 99.0, 200),  # only after every left row
        ],
        "k string, rt double, payload long",
    )
    return left, right


def test_asof_basic(sides):
    left, right = sides
    out = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt"
        ).collect()
    }
    assert out == {1: 101, 2: 102, 3: None, 4: None}


def test_asof_tiebreak(spark):
    left = spark.createDataFrame([(1, "a", 10.0)], "eid long, k string, t double")
    right = spark.createDataFrame(
        [("a", 5.0, 7), ("a", 5.0, 9), ("a", 5.0, 8)],
        "k string, rt double, payload long",
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        right_tiebreak=["payload"],
    ).collect()
    assert out[0]["payload"] == 9  # greatest tiebreak wins deterministically


def test_asof_keeps_all_left_columns(sides):
    left, right = sides
    cols = asof_join(left, right, on="k", left_time="t", right_time="rt").columns
    assert cols == ["eid", "k", "t", "payload"]
