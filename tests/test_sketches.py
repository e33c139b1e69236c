"""Approximate aggregates — the scale path for distinct counts and
percentiles (exact forms hold whole groups in memory; sketches don't).

The oracle registry keeps exact forms (engine-portable values); these
tests pin the approximate forms to their error contracts so the scale
path is verified too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.session import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(0.15 * row["exact"], 3)


def test_percentile_approx_tracks_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx"),
    ).collect()[0]
    # high-accuracy sketch on quantized 2-dp data: within one tick
    assert abs(row["approx"] - row["exact"]) <= 0.05
