"""Watermarked event-time windows: late data dropped, windows finalized
exactly once (the capability upgrade over the reference's
processing-time-only model)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tower_parse_spark.plans.profile import DeviceProfile
from tower_parse_spark.streaming.pipeline import event_time_stats

PROF = DeviceProfile(name="wm", regex=[r"^v=(?P<v>\S+)$"])

BASE = 1_700_000_000  # epoch anchor


def write_batches(tmp_path, batches):
    d = tmp_path / "in"
    d.mkdir()
    for i, rows in enumerate(batches):
        p = d / f"b{i}.txt"
        p.write_text("\n".join(f"{t} v={v}" for (t, v) in rows) + "\n")
        # the file source orders triggers by modification time, not name —
        # force a strictly increasing mtime so batch order is deterministic
        os.utime(p, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
    return str(d)


def parse(spark, src):
    raw = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
    split = F.split(F.col("value"), " ", 2)
    return raw.select(
        split[0].cast("double").alias("time"),
        F.regexp_extract(split[1], r"^v=(\S+)$", 1).cast("double").alias("v"),
    )


def test_late_rows_dropped_windows_finalized(spark, tmp_path):
    # Watermark updates lag one micro-batch (batch N's filter uses the
    # max event time from batches <= N-2), so the too-late replay of a
    # minute-0 row goes in the THIRD file: by then the watermark derived
    # from trigger 1 (BASE+250 - 2min) has passed the minute-0 window and
    # the row must be dropped, not re-open the closed window.
    batches = [
        [(BASE + 10, 1.0), (BASE + 250, 2.0)],
        [(BASE + 600, 4.0)],
        [(BASE + 5, 100.0), (BASE + 1200, 8.0)],  # 100.0 is too late
    ]
    src = write_batches(tmp_path, batches)
    stats = event_time_stats(
        parse(spark, src), window="1 minute", watermark="2 minutes",
        value_cols=["v"],
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("wm_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        int(r["window_start"].timestamp()): (r["n_rows"], r["sum_v"])
        for r in spark.sql("SELECT * FROM wm_mem").collect()
    }
    def wstart(t):
        return t - t % 60

    # minute-0 window finalized WITHOUT the late 100.0 row
    assert rows[wstart(BASE + 10)] == (1, 1.0)
    # the other on-time windows finalized with exactly their rows
    assert rows[wstart(BASE + 250)] == (1, 2.0)
    assert rows[wstart(BASE + 600)] == (1, 4.0)
    # the newest window is still open (watermark hasn't passed it)
    assert wstart(BASE + 1200) not in rows
