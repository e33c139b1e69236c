"""Deterministic sampling/splitting (operators/sampling.py).

The property under test everywhere: assignment is a pure function of the
row key — invariant under repartitioning, re-evaluation, and row order —
because that is what makes a 100 TB split reproducible across pipeline
runs (df.sample()/rand() are not)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
    stratified_downsample,
    with_split,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, f"src{i % 4}", f"doc number {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_split_deterministic_under_repartition(spark, docs):
    a = with_split(docs).select("doc_id", "split")
    b = with_split(docs.repartition(7).sortWithinPartitions(F.desc("doc_id"))).select(
        "doc_id", "split"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_weights_roughly_respected(spark, docs):
    counts = dict(
        with_split(docs, weights={"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    # 400 uniform hash buckets: train should dominate by a wide margin
    assert counts["train"] > 300
    assert counts.get("val", 0) + counts.get("test", 0) < 100


def test_split_is_partition_of_rows(spark, docs):
    out = with_split(docs)
    assert out.count() == docs.count()
    assert out.filter(F.col("split").isNull()).count() == 0


def test_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        with_split(docs, weights={"train": 0.5, "val": 0.1})


def test_bucket_range_and_stability(spark, docs):
    b = docs.select(hash_bucket(F.col("doc_id")).alias("b"))
    lo, hi = b.agg(F.min("b"), F.max("b")).first()
    assert 0 <= lo and hi < N_BUCKETS
    # same key, same salt -> same bucket; different salt -> decorrelated
    one = docs.select(
        hash_bucket(F.col("doc_id"), "a").alias("x"),
        hash_bucket(F.col("doc_id"), "a").alias("y"),
        hash_bucket(F.col("doc_id"), "z").alias("z"),
    )
    assert one.filter(F.col("x") != F.col("y")).count() == 0
    assert one.filter(F.col("x") != F.col("z")).count() > 0


def test_stratified_downsample_rates(spark, docs):
    kept = stratified_downsample(
        docs, {"src0": 0.0, "src1": 1.0, "src2": 0.5}, default_rate=1.0
    )
    counts = dict(kept.groupBy("source").count().collect())
    assert "src0" not in counts  # rate 0 drops everything
    assert counts["src1"] == 100  # rate 1 keeps everything
    assert 20 < counts["src2"] < 80  # ~50 of 100
    assert counts["src3"] == 100  # unlisted stratum -> default_rate


def test_downsample_is_subset_and_deterministic(spark, docs):
    kept1 = stratified_downsample(docs, {"src0": 0.3}, default_rate=0.7)
    kept2 = stratified_downsample(
        docs.repartition(11), {"src0": 0.3}, default_rate=0.7
    )
    ids1 = sorted(r.doc_id for r in kept1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in kept2.select("doc_id").collect())
    assert ids1 == ids2
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert set(ids1) <= all_ids


def test_null_key_buckets_to_null_on_both_engines(spark):
    """NULL keys must bucket to NULL exactly like the SQL twin's
    null-propagating || — concat_ws would silently collapse them all
    into the md5(salt) bucket on the Spark side only (code review r7)."""
    import duckdb

    from tower_parse_spark.operators.sampling import sql_hash_bucket

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    rows = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    assert rows[1] is not None
    assert rows[None] is None
    oracle = duckdb.sql(
        "SELECT " + sql_hash_bucket("doc_id")
        + " AS b FROM (VALUES (1), (NULL)) t(doc_id) ORDER BY doc_id NULLS LAST"
    ).fetchall()
    assert oracle[0][0] == rows[1]
    assert oracle[1][0] is None
