"""Bucketed co-located join: the physical plan must contain no Exchange
on either side — the write-time shuffle is the only one ever paid."""

from __future__ import annotations

import pytest

from tower_parse_spark.operators.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 10_000).selectExpr(
        "id AS k", "id * 2 AS lval"
    )
    right = spark.range(0, 10_000).selectExpr(
        "id AS k", "id * 3 AS rval"
    )
    write_bucketed(left, "bk_left", str(tmp_path / "l"), "k", num_buckets=8)
    write_bucketed(right, "bk_right", str(tmp_path / "r"), "k", num_buckets=8)
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_colocated_join_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a non-broadcast join so the shuffle (absence) is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also skips the shuffle."""
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("k").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
