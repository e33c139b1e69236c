"""Semantic dedup semantics (operators/semdedup.py).

Cross-engine value parity is owned by the semantic_dedup oracle query;
these tests pin the operator rules on hand-built vectors: the
centroid-nearest member of a similar pair survives, dissimilar members
coexist, malformed vectors are excluded from pairing but kept, and the
greedy chain rule drops every beaten member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.operators import semdedup as SD
from tower_parse_spark.operators.similarity import lattice_centroids

DIM = 8


def _flags(spark, rows, centroids=None, threshold=0.9):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = SD.semantic_dedup_flags(
        df, dim=DIM, centroids=centroids, threshold=threshold
    )
    return {r.vec_id: r for r in out.collect()}


def test_similar_pair_keeps_centroid_nearest(spark):
    # centroid 0 = e0 direction; v1 is exactly on it, v2 slightly off but
    # cos(v1, v2) ~ 1 -> v2 drops, v1 keeps
    cents = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    out = _flags(
        spark,
        [
            (1, [10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (2, [10.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            # different cell entirely (centroid 1): untouched
            (3, [0.0, 7.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        ],
        centroids=cents,
    )
    assert out[1].keep and not out[1].is_semdup
    assert out[2].is_semdup and not out[2].keep and out[2].n_better == 1
    assert out[3].keep
    assert out[1].cell == out[2].cell != out[3].cell


def test_tie_breaks_toward_lower_id(spark):
    cents = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    # identical vectors: same cent_cos -> lower id wins
    out = _flags(
        spark,
        [
            (7, [3.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (9, [3.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        ],
        centroids=cents,
    )
    assert out[7].keep and out[9].is_semdup


def test_dissimilar_same_cell_coexist(spark):
    cents = [[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]]
    out = _flags(
        spark,
        [
            (1, [5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]),
            (2, [0.0, 0.0, 0.0, 1.0, 0.0, 5.0, 0.0, 0.0]),
        ],
        centroids=cents,
    )
    assert out[1].keep and out[2].keep


def test_malformed_vectors_kept_but_never_paired(spark):
    cents = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    out = _flags(
        spark,
        [
            (1, [4.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (2, None),
            (3, [0.0] * DIM),  # zero norm
        ],
        centroids=cents,
    )
    assert out[2].keep and out[3].keep
    assert out[2].cell == 0 and out[2].cent_cos is None
    assert len(out) == 3


def test_chain_drops_every_beaten_member(spark):
    # a closest to centroid, b next, c farthest; all pairwise similar ->
    # only a survives (b beaten by a, c beaten by both)
    cents = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    out = _flags(
        spark,
        [
            (1, [10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (2, [10.0, 0.4, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (3, [10.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        ],
        centroids=cents,
    )
    assert out[1].keep
    assert out[2].is_semdup and out[2].n_better == 1
    assert out[3].is_semdup and out[3].n_better == 2
