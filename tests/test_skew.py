"""Salted join: result-equivalence with a plain join under heavy skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators.skew import salted_join


def test_salted_join_equivalence(spark):
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else i) for i in range(1000)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 1000, 10)] + [(1, "v1")],
        "k long, label string",
    )
    plain = fact.join(dim, "k").select("row_id", "k", "label")
    salted = salted_join(fact, dim, "k", n_salts=4).select(
        "row_id", "k", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left(spark):
    fact = spark.createDataFrame([(1, 5), (2, 99)], "row_id long, k long")
    dim = spark.createDataFrame([(5, "x")], "k long, label string")
    rows = {
        r["row_id"]: r["label"]
        for r in salted_join(fact, dim, "k", n_salts=3, how="left").collect()
    }
    assert rows == {1: "x", 2: None}


def test_salted_join_rejects_unsupported_how(spark):
    fact = spark.createDataFrame([(1, 5)], "row_id long, k long")
    dim = spark.createDataFrame([(5, "x")], "k long, label string")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", how=how)


def test_salted_join_deterministic_salt_col(spark):
    """salt_col derives the salt from a stable column hash: equivalent
    results, reproducible under task retry (no rand())."""
    fact = spark.createDataFrame(
        [(i, 1 if i % 5 else i) for i in range(200)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 200, 5)] + [(1, "v1")],
        "k long, label string",
    )
    plain = fact.join(dim, "k").select("row_id", "k", "label")
    salted = salted_join(
        fact, dim, "k", n_salts=4, salt_col="row_id"
    ).select("row_id", "k", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "rand(" not in plan
