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


@pytest.fixture()
def blob_corpus(spark):
    """Three well-separated directional blobs in R^4 (cosine metric)."""
    import random

    rng = random.Random(7)
    dirs = [[5.0, 0.1, 0.1, 0.1], [0.1, 5.0, 0.1, 0.1], [0.1, 0.1, 5.0, 0.1]]
    rows = []
    for b, d in enumerate(dirs):
        for i in range(40):
            rows.append(
                (
                    b * 100 + i,
                    b,
                    [x + rng.uniform(-0.3, 0.3) for x in d],
                )
            )
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<double>"
    )


def test_kmeans_recovers_blobs(blob_corpus):
    """Lloyd training: each blob maps to exactly one trained centroid
    (pure assignments), and assignments are strictly better than under
    the lattice init for at least one blob-splitting case avoided."""
    cents = S.kmeans_centroids(blob_corpus, dim=4, k=3, iters=5)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
    cell = S.ivf_cells(
        as_double(F.col("embedding")), 4, 1, centroids=cents
    )[0]
    rows = blob_corpus.select("blob", cell.alias("cell")).collect()
    by_blob: dict[int, set[int]] = {}
    for r in rows:
        by_blob.setdefault(r["blob"], set()).add(r["cell"])
    # pure: every blob lands in exactly one cell, all cells distinct
    assert all(len(cells) == 1 for cells in by_blob.values())
    assert len({next(iter(c)) for c in by_blob.values()}) == 3


def test_ivf_topk_with_trained_centroids(blob_corpus, spark):
    cents = S.kmeans_centroids(blob_corpus, dim=4, k=3, iters=3)
    probes = spark.createDataFrame(
        [(900, [5.0, 0.1, 0.1, 0.1])], "probe_id long, embedding array<double>"
    )
    out = S.ivf_topk(
        blob_corpus, probes, dim=4, k=5, centroids=cents
    ).collect()
    assert len(out) == 5
    # all results come from the probe's blob (ids 0..39)
    assert all(r["vec_id"] < 100 for r in out)
