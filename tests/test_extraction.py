"""Regex projection operator — the reference's hot path (Parser.extract).

Mirrors tests/test_parser.py: extraction correctness, sentinel handling,
alternation (multi-format) unification, malformed routing, group-key casts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.functions.extraction import (
    extract_lines,
    group_indices,
    unnamed_pattern,
)
from tower_parse_spark.plans.profile import DeviceProfile, GroupSpec

PROBE = DeviceProfile(
    name="probe",
    regex=[r"^(?P<level>\d+) RH= (?P<rh>\S+) %RH T= (?P<temp>\S+) .C ID=(?P<id>\d+)$"],
    group=GroupSpec("level", "int"),
    pack_length=2,
)


def test_unnamed_pattern_strips_python_syntax():
    assert unnamed_pattern(r"(?P<a>\d+)x(?P<b>\w)") == r"(\d+)x(\w)"


def test_group_indices():
    assert group_indices(r"(?P<a>\d+)x(?P<b>\w)") == {"a": 1, "b": 2}


def test_extract_typed_rows(lines_df):
    out = extract_lines(lines_df, PROBE, extra_cols=["event_id"])
    rows = {r["event_id"]: r for r in out.collect()}
    # torn line 4 filtered out
    assert set(rows) == {1, 2, 3, 5}
    r1 = rows[1]
    assert (r1["level"], r1["rh"], r1["temp"], r1["id"]) == (1, 10.5, -10.5, 1.0)
    assert r1["time"] == 100.0
    # schema: group key int, everything else double (readport.py:324-326)
    dt = dict(out.dtypes)
    assert dt["level"] == "int"
    assert dt["rh"] == dt["temp"] == dt["id"] == "double"


def test_sentinel_becomes_null(lines_df):
    out = extract_lines(lines_df, PROBE, extra_cols=["event_id"])
    r2 = {r["event_id"]: r for r in out.collect()}[2]
    assert r2["rh"] is None  # '///' -> NULL (divergence doc: SURVEY §7.4)
    assert r2["temp"] == 20.0  # rest of the record survives


def test_corrupt_routing(lines_df):
    out = extract_lines(lines_df, PROBE, keep_corrupt=True, extra_cols=["event_id"])
    flags = {r["event_id"]: r["_corrupt"] for r in out.collect()}
    assert flags == {1: False, 2: False, 3: False, 4: True, 5: False}


def test_multiformat_coalesce(spark):
    """A9: two wire formats -> one schema via per-column branch coalesce."""
    prof = DeviceProfile(
        name="alt",
        regex=[
            r"^(?P<level>\d+) RH= (?P<rh>\S+)$",
            r"^RH= (?P<rh>\S+) L=(?P<level>\d+)$",
        ],
        group=GroupSpec("level", "int"),
    )
    df = spark.createDataFrame(
        [(1, 1.0, "02 RH= +3.5"), (2, 2.0, "RH= -4.5 L=7")],
        "event_id long, ts double, line string",
    )
    rows = {
        r["event_id"]: r
        for r in extract_lines(df, prof, extra_cols=["event_id"]).collect()
    }
    assert (rows[1]["level"], rows[1]["rh"]) == (2, 3.5)
    assert (rows[2]["level"], rows[2]["rh"]) == (7, -4.5)


def test_str_group_key(spark):
    prof = DeviceProfile(
        name="s",
        regex=[r"^(?P<name>\w+)=(?P<v>\S+)$"],
        group=GroupSpec("name", "str"),
    )
    df = spark.createDataFrame([(1.0, "so2=0.5")], "ts double, line string")
    out = extract_lines(df, prof)
    assert dict(out.dtypes)["name"] == "string"
    assert out.collect()[0]["name"] == "so2"


def test_cast_failure_yields_null(spark):
    """Non-numeric capture -> NULL double, record NOT dropped (documented
    divergence from the reference's record-skip, readport.py:353-364)."""
    prof = DeviceProfile(name="c", regex=[r"^v=(?P<v>\S+)$"])
    df = spark.createDataFrame([(1.0, "v=abc")], "ts double, line string")
    row = extract_lines(df, prof).collect()[0]
    assert row["v"] is None


def test_binary_payload_control_char_frame(spark):
    """The documented binary-ingest path (SURVEY §7.4): a Gill anemometer
    frame with STX/ETX control bytes (reference tests/test_parser.py:21)
    arrives as BinaryType, is decoded to string, and extracts through the
    same one-pass plan — control chars flow through `.+` like the
    reference's bytes-regex match."""
    frame = b"\x02Q,+000.079,-000.102,+000.095,M,+014.94,0000001,\x030F\r\n"
    prof = DeviceProfile(
        name="gill",
        regex=[
            r"^.+,(?P<u>[^,]+),(?P<v>[^,]+),(?P<w>[^,]+),.,(?P<temp>[^,]+),.+$"
        ],
    )
    torn = b"M,+014.94,0000001,\x030F\r\n"  # test_parser.py:33 torn packet
    df = spark.createDataFrame(
        [(1, 100.0, bytearray(frame)), (2, 101.0, bytearray(torn))],
        "event_id long, ts double, payload binary",
    )
    lines = df.withColumn("line", F.decode(F.col("payload"), "UTF-8"))
    out = extract_lines(lines, prof, extra_cols=["event_id"])
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {1}  # torn frame filtered, like ParseError skip
    r = rows[1]
    assert (r["u"], r["v"], r["w"], r["temp"]) == (0.079, -0.102, 0.095, 14.94)
