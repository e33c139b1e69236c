"""Batch source formats: the engine's analytics are format-agnostic.

The driver tables are parquet, but a reference user's archives may be
CSV or JSON lines — prove the same aggregation gives identical results
across all three, with explicit schemas (never inference in production:
inference scans the data once and guesses types).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def agg(df):
    return sorted(
        map(
            tuple,
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"),
            )
            .collect(),
        )
    )


def test_same_results_across_formats(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    want = agg(ev)
    schema = ev.schema

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    ev.write.option("header", True).csv(csv_dir)
    ev.write.json(json_dir)

    got_csv = agg(spark.read.schema(schema).option("header", True).csv(csv_dir))
    got_json = agg(spark.read.schema(schema).json(json_dir))
    assert got_csv == want
    assert got_json == want
