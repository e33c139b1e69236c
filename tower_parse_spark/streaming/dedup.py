"""Streaming exact dedup — bounded-state duplicate dropping on a stream.

Batch exact dedup (operators/dedup.py::exact_dedup) has no streaming
equivalent in the reference at all (its socket pipeline forwards every
line). Spark's ``dropDuplicatesWithinWatermark`` is the scale-correct
primitive: state is keyed on the dedup columns and expired once the
watermark passes, so memory is bounded by the duplicate-arrival horizon
instead of the stream's lifetime — the property that makes streaming
dedup viable on an unbounded 100 TB/day feed (a plain
``dropDuplicates`` on a stream accumulates state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    parsed: DataFrame,
    key_cols: list[str],
    time_col: str = "time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same *key_cols*) arriving within the
    *watermark* horizon of the first occurrence.

    *time_col* is epoch-seconds double (the parse schema's ``time``);
    it converts to a timestamp column ``_evt`` for watermarking — kept in
    the output (callers may drop it). Duplicates separated by more than
    the watermark delay re-emit: choose the horizon from the duplicate
    source (e.g. sensor retransmit window), not from a memory budget.
    """
    return (
        parsed.withColumn("_evt", F.timestamp_seconds(F.col(time_col)))
        .withWatermark("_evt", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
