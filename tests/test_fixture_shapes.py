"""Fixture-shape-proofing: ``events.ts`` has shipped in different parquet
physical types across test-data regenerations (TIMESTAMP(NANOS) in round 1,
micros TIMESTAMP_NTZ in round 2). ``session.load_table`` must normalize any
of them to a session-tz TIMESTAMP so every downstream ``ts.cast("double")``
(epoch-seconds, readport.py:449-453 stamping parity) analyzes.

Writes a tiny events table in each of the three shapes and asserts the
load + ingest probe path works on all of them, with identical epoch values.
"""

from __future__ import annotations

import pytest

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from tower_parse_spark.queries.ingest import _probe_lines
from tower_parse_spark.session import load_table

# One row per shape is enough to prove analysis + value parity.
_EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789 // 1000 * 1000]


def _base_arrays():
    n = len(_EPOCH_US)
    return {
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([1.25] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }


def _write_events(dirpath, ts_array):
    cols = _base_arrays()
    table = pa.table(
        {
            "event_id": cols["event_id"],
            "ts": ts_array,
            "user_id": cols["user_id"],
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.fixture(
    params=["nanos_as_long", "micros_ntz", "micros_tz"],
)
def events_dir(request, tmp_path):
    """A tiny events.parquet in one of the three observed fixture shapes."""
    if request.param == "nanos_as_long":
        # parquet TIMESTAMP(NANOS): Spark reads it as bigint under
        # spark.sql.legacy.parquet.nanosAsLong
        ts = pa.array([us * 1000 for us in _EPOCH_US], pa.timestamp("ns"))
    elif request.param == "micros_ntz":
        ts = pa.array(_EPOCH_US, pa.timestamp("us"))
    else:
        ts = pa.array(_EPOCH_US, pa.timestamp("us", tz="UTC"))
    return _write_events(tmp_path, ts)


def test_load_table_normalizes_ts(spark, events_dir):
    df = load_table(spark, events_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # cast("double") must analyze AND give exact epoch seconds (UTC session)
    got = (
        df.select(F.col("ts").cast("double").alias("t"))
        .orderBy("t")
        .collect()
    )
    want = sorted(us / 1e6 for us in _EPOCH_US)
    assert [r["t"] for r in got] == pytest.approx(want, abs=0)


def test_probe_lines_analyzes_on_any_shape(spark, events_dir):
    lines = _probe_lines(spark, events_dir)
    rows = lines.orderBy("event_id").collect()
    assert len(rows) == len(_EPOCH_US)
    assert rows[0]["ts"] == pytest.approx(_EPOCH_US[0] / 1e6, abs=0)
    assert "RH=" in rows[0]["line"]


def test_non_utc_caller_session_gets_utc_semantics(spark):
    """The driver calls queries with its OWN session. If that session's
    timezone were not UTC, NTZ casts and date_trunc would shift against
    the tz-naive DuckDB oracle. load_table pins the session tz, so a
    caller who set a different one still gets UTC-parity values."""
    from tower_parse_spark.session import load_table

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        # pinned back to UTC by load_table
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        row = (
            df.select(F.col("ts").cast("double").alias("t"))
            .orderBy("t")
            .first()
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .select(F.col("ts").cast("double").alias("t"))
            .orderBy("t")
            .first()
        )
        assert row["t"] == want["t"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_load_table_cache_sees_regenerated_fixture(spark, tmp_path):
    """ADVICE r10: the analyzed-plan cache must key on the table file's
    stat fingerprint — a fixture REGENERATED at the same path within a
    live session is a cache miss, not a stale listing."""
    import time as _time

    d = str(tmp_path)
    spark.range(3).toDF("r_regionkey").write.parquet(f"{d}/region.parquet")
    assert load_table(spark, d, "region").count() == 3
    # regenerate in place with different contents
    _time.sleep(0.05)  # ensure mtime_ns moves even on coarse filesystems
    spark.range(7).toDF("r_regionkey").write.mode("overwrite").parquet(
        f"{d}/region.parquet"
    )
    assert load_table(spark, d, "region").count() == 7
    # unchanged path still serves the cached plan (same fingerprint)
    assert load_table(spark, d, "region") is load_table(spark, d, "region")


def test_load_table_cache_sees_buried_change_in_nested_layout(spark, tmp_path):
    """VERDICT r12 #6: a PARTITIONED layout can change a buried file
    while every top-level name/mtime/size stays put (a partition
    directory's mtime moves only on entry create/delete, not content
    rewrite), which the r12 shallow fingerprint documented as a
    stale-plan hole. The fingerprint now auto-deepens when the top
    level contains directories: the buried rewrite is a cache miss."""
    import os as _os
    import time as _time

    from tower_parse_spark.session import _table_fingerprint

    d = str(tmp_path)
    tbl = f"{d}/region.parquet"
    spark.range(4).selectExpr(
        "id as r_regionkey", "cast(id % 2 as int) as part"
    ).write.partitionBy("part").parquet(tbl)
    assert load_table(spark, d, "region").count() == 4
    fp_before = _table_fingerprint(d, "region")

    # rewrite ONE buried file in place: same name, same size, new
    # mtime; then pin the PARTITION DIR's and table root's stats back
    # so only the buried file differs (the hole under test)
    part_dir = f"{tbl}/part=0"
    root_st = _os.stat(tbl)
    dir_st = _os.stat(part_dir)
    buried = next(
        _os.path.join(part_dir, f)
        for f in _os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    _time.sleep(0.05)
    _os.utime(buried)  # content rewrite stand-in: mtime_ns moves
    _os.utime(part_dir, ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    _os.utime(tbl, ns=(root_st.st_atime_ns, root_st.st_mtime_ns))

    fp_after = _table_fingerprint(d, "region")
    assert fp_after != fp_before  # the deep walk sees the buried change
    # and the SHALLOW form demonstrably would not have (rule non-vacuous)
    assert _table_fingerprint(d, "region", deep=False) == tuple(
        e for e in fp_before if "/" not in e[0]
    )
    # flat layouts keep the shallow fingerprint bit-identical
    spark.range(3).toDF("n_nationkey").write.parquet(f"{d}/nation.parquet")
    assert _table_fingerprint(d, "nation") == _table_fingerprint(
        d, "nation", deep=False
    )


def test_deep_fingerprint_walks_once_per_changed_state(spark, tmp_path):
    """VERDICT r13 #6: the auto-deepened fingerprint must not os.walk
    the layout on EVERY load — the full walk runs once per CHANGED
    state (memo keyed on a depth<=2 stat signature) and loads between
    changes serve the memoized fingerprint. deep=True stays the
    fresh-walk bypass."""
    import os as _os

    import tower_parse_spark.session as S

    d = str(tmp_path)
    tbl = f"{d}/region.parquet"
    # two-level partitioning: files at depth 3, where the walk cost is
    # O(files) but the memo signature is O(partition dirs)
    spark.range(8).selectExpr(
        "id as r_regionkey",
        "cast(id % 2 as int) as part",
        "cast(id % 2 as int) as sub",
    ).write.partitionBy("part", "sub").parquet(tbl)

    real_walk = _os.walk
    calls = {"n": 0}

    def counting_walk(*a, **k):
        calls["n"] += 1
        return real_walk(*a, **k)

    _os.walk = counting_walk
    try:
        S._DEEP_FP_MEMO.clear()
        fp1 = S._table_fingerprint(d, "region")
        walks_first = calls["n"]
        assert walks_first > 0  # the deep walk ran
        fp2 = S._table_fingerprint(d, "region")
        fp3 = S._table_fingerprint(d, "region")
        assert fp2 == fp1 and fp3 == fp1
        assert calls["n"] == walks_first  # NO further walks: memo hit
        # a depth-3 change (new file inside part=1/sub=1) bumps its
        # depth-2 parent dir, the signature misses the memo, one more
        # walk runs, and the fingerprint moves
        target = f"{tbl}/part=1/sub=1"
        with open(_os.path.join(target, "extra.parquet.crc2"), "w") as f:
            f.write("x")
        fp4 = S._table_fingerprint(d, "region")
        assert fp4 != fp1
        assert calls["n"] == 2 * walks_first  # exactly one more walk
        S._table_fingerprint(d, "region")
        assert calls["n"] == 2 * walks_first  # and memoized again
        # deep=True bypasses the memo (the documented escape hatch)
        S._table_fingerprint(d, "region", deep=True)
        assert calls["n"] == 3 * walks_first
        # the memo key evicts superseded signatures: one entry per path
        assert (
            len([k for k in S._DEEP_FP_MEMO if k[0] == _os.path.abspath(tbl)])
            == 1
        )
    finally:
        _os.walk = real_walk


def test_deep_fingerprint_sees_depth4_create(spark, tmp_path):
    """Review r14: the memo signature must catch a Spark-committer
    create at ANY nesting depth. Three-level partitioning (files at
    depth 4): a new file inside an existing leaf dir bumps only that
    depth-3 dir's mtime — invisible to a depth<=2 signature, caught by
    the dirs-at-every-depth stats."""
    import os as _os

    import tower_parse_spark.session as S

    d = str(tmp_path)
    tbl = f"{d}/region.parquet"
    spark.range(8).selectExpr(
        "id as r_regionkey",
        "cast(id % 2 as int) as y",
        "cast(id % 2 as int) as m",
        "cast(id % 2 as int) as dd",
    ).write.partitionBy("y", "m", "dd").parquet(tbl)
    S._DEEP_FP_MEMO.clear()
    fp1 = S._table_fingerprint(d, "region")
    assert S._table_fingerprint(d, "region") == fp1  # memo hit
    leaf = f"{tbl}/y=1/m=1/dd=1"
    assert _os.path.isdir(leaf)
    with open(_os.path.join(leaf, "part-extra.parquet.tmp2"), "w") as f:
        f.write("x")
    fp2 = S._table_fingerprint(d, "region")
    assert fp2 != fp1  # signature missed the memo, walk re-ran
