"""ensure_parallelism and its file-metadata split estimator.

The estimator mirrors Spark's FilePartition bin-packing (maxSplitBytes +
openCostInBytes + greedy largest-first packing); the tests pin it
against Spark's OWN planned partition count so a Spark-version change in
the split math fails here by name.
"""

from __future__ import annotations

import pytest

from tower_parse_spark.session import (
    _estimated_scan_splits,
    _size_bytes_conf,
    ensure_parallelism,
)


def test_size_conf_accepts_all_spark_forms(spark):
    key = "spark.sql.files.maxPartitionBytes"
    orig = spark.conf.get(key, None)
    try:
        for raw, expect in (
            ("134217728", 134217728),
            ("134217728b", 134217728),
            ("128m", 134217728),
            ("1g", 1073741824),
        ):
            spark.conf.set(key, raw)
            assert _size_bytes_conf(spark, key, 0) == expect, raw
        spark.conf.set(key, "128m")
        # a size-unit conf must not explode the helper's caller
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        ensure_parallelism(df).count()
    finally:
        if orig is not None:
            spark.conf.set(key, orig)


def test_size_conf_default_on_garbage(spark):
    assert _size_bytes_conf(spark, "spark.nonexistent.conf", 42) == 42


@pytest.fixture()
def many_small_files(spark, tmp_path):
    """40 tiny one-row-group files — the case Spark bin-packs into far
    fewer partitions than files (openCostInBytes)."""
    p = str(tmp_path / "many")
    spark.range(40).repartition(40).write.parquet(p)
    return spark.read.parquet(p)


def test_estimate_matches_spark_planning_small_files(many_small_files):
    est = _estimated_scan_splits(many_small_files)
    actual = many_small_files.rdd.getNumPartitions()
    assert est == actual, (
        f"split simulation ({est}) diverged from Spark's planned "
        f"partitions ({actual}) — FilePartition's split math changed"
    )
    # and the point of the exercise: far fewer partitions than files
    assert est < 40


def test_estimate_matches_spark_planning_single_file(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert _estimated_scan_splits(df) == df.rdd.getNumPartitions()


def test_ensure_parallelism_repartitions_small_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    target = spark.sparkContext.defaultParallelism
    assert ensure_parallelism(df).rdd.getNumPartitions() >= target


def test_ensure_parallelism_passthrough_when_parallel(spark):
    df = spark.range(1000).repartition(64)
    # non-file relation -> exact RDD fallback -> already >= target
    assert ensure_parallelism(df) is df


def test_ensure_parallelism_bin_packed_small_files(many_small_files, spark):
    """40 files is NOT 40 partitions: the old file-count shortcut would
    skip the repartition here and serialize CPU-bound work into the few
    bin-packed partitions; the simulation sees through the packing."""
    target = spark.sparkContext.defaultParallelism
    out = ensure_parallelism(many_small_files)
    assert out.rdd.getNumPartitions() >= min(target, 40)
