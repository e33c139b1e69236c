"""Salted join: result-equivalence with a plain join under heavy skew."""

from __future__ import annotations

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
