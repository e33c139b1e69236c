"""Similarity search: exact brute-force top-k and hyperplane LSH."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.functions.vectors import as_double
from tower_parse_spark.operators import similarity as S


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
        (5, [0.7, 0.7]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def probes(spark):
    return spark.createDataFrame(
        [(100, [1.0, 0.0])], "probe_id long, embedding array<double>"
    )


def test_brute_force_ranking(corpus, probes):
    out = S.brute_force_topk(corpus, probes, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2, 5]
    assert out[0]["cos_sim"] == 1.0
    assert out[1]["cos_sim"] == pytest.approx(
        0.9 / math.hypot(0.9, 0.1), abs=1e-4
    )
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_lsh_topk_subset_of_bucket(corpus, probes):
    out = S.hyperplane_lsh_topk(corpus, probes, dim=2, k=3).collect()
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # the probe's own vector must share its bucket and rank first
    assert got[0] == 1
    # LSH never returns lower-cos results above higher-cos ones
    sims = [r["cos_sim"] for r in sorted(out, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)


def test_identical_vectors_same_bucket(spark):
    df = spark.createDataFrame(
        [(1, [0.3] * 8), (2, [0.3] * 8)], "vec_id long, embedding array<double>"
    )
    b = df.select(
        S.bucket_expr(as_double(F.col("embedding")), 8).alias("b")
    ).collect()
    assert b[0]["b"] == b[1]["b"]
