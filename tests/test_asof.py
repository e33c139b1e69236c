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


def test_asof_forward(sides):
    """Forward direction: earliest right row at or after the left time."""
    left, right = sides
    out = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="rt",
            direction="forward",
        ).collect()
    }
    # eid1 t=10 -> rt=10 (equal included); eid2 t=20 -> nothing after;
    # eid3 t=15 -> rt=99; eid4 'c' -> no right rows at all
    assert out == {1: 101, 2: None, 3: 200, 4: None}


def test_asof_tolerance(sides):
    """Bounded staleness: matches further than the tolerance null out."""
    left, right = sides
    out = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="rt",
            tolerance=1.5,
        ).collect()
    }
    # eid1: rt=10 gap 0 ok; eid2: rt=19 gap 1 ok; eid3: rt none before
    assert out == {1: 101, 2: 102, 3: None, 4: None}
    strict = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="rt",
            tolerance=0.5,
        ).collect()
    }
    assert strict == {1: 101, 2: None, 3: None, 4: None}


def test_asof_rejects_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            direction="nearest",
        )
