"""Bucketed tables — shuffle-free co-located joins for repeated big joins.

At 100 TB the dominant cost of a fact-to-fact join (orders x lineitem,
documents x signatures) is the shuffle of both sides on the key. When the
same join runs repeatedly (daily pipelines), the scale-first answer is to
pay that shuffle ONCE at write time: ``bucketBy(N, key)`` hash-partitions
files on disk; a later join of two tables bucketed on the same key with
the same N reads matching buckets directly — the physical plan has NO
Exchange on either side (verified in tests/test_bucketing.py).

This is Spark's native equivalent of the co-located table layout every
MPP warehouse offers; nothing engine-specific here beyond choosing N
(buckets ≈ target parallelism; each bucket should fit an executor's
memory at the largest table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    num_buckets: int = 32,
) -> None:
    """Persist *df* hash-bucketed (and sorted) on *key* as a catalog
    table backed by *path* — the one-time shuffle that every later
    co-located join amortizes."""
    (
        df.write.bucketBy(num_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key same-N bucketed tables: bucket-local, no
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
