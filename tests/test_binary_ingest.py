"""Byte-level ingest: control-char-framed device lines through
BinaryType -> decode -> ``extract_lines``.

The reference matches its regex against raw *bytes* including framing
control characters — the Gill anemometer wire format is
``\\x02Q,<u>,<v>,<w>,M,<temp>,<serial>,\\x03<checksum>\\r\\n``
(tests/test_parser.py:21, readport.py:552 reads the configured regex as a
byte-string). SURVEY.md §7.4 documents the engine's divergence: Spark
carries raw frames as BinaryType and decodes with ISO-8859-1 (a bijection
byte<->char, so every control byte survives) before the JVM-regex
projection. This test drives a real STX/ETX-framed frame through that
exact path — the first thing a user porting the Gill config would hit.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tower_parse_spark.functions.extraction import extract_lines
from tower_parse_spark.plans.profile import DeviceProfile

# the reference's Gill pattern (tests/test_parser.py:13), decoded latin-1:
# leading .+ consumes the STX+address prefix, trailing .+$ the ETX+checksum
GILL_REGEX = (
    r"^.+,(?P<u>[^,]+),(?P<v>[^,]+),(?P<w>[^,]+),.,(?P<temp>[^,]+),.+$"
)

GILL_PROFILE = DeviceProfile(name="gill", regex=[GILL_REGEX], pack_length=1)

# the reference test's exact wire frame (tests/test_parser.py:21)
GILL_FRAME = b"\x02Q,+000.079,-000.102,+000.095,M,+014.94,0000001,\x030F\r\n"
TORN_FRAME = b"M,+014.94,0000001,\x030F\r\n"  # tests/test_parser.py:33


@pytest.fixture()
def binary_frames(spark):
    rows = [
        (1, 100.0, bytearray(GILL_FRAME)),
        (2, 101.0, bytearray(TORN_FRAME)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts double, raw binary"
    )


def _decoded(binary_frames):
    # ISO-8859-1 maps each byte 0x00-0xFF to the same code point: control
    # bytes (STX \x02, ETX \x03, CR, LF) survive the decode losslessly
    return binary_frames.withColumn(
        "line", F.decode(F.col("raw"), "ISO-8859-1")
    )


def test_gill_frame_extracts_through_control_chars(binary_frames):
    out = extract_lines(
        _decoded(binary_frames), GILL_PROFILE, extra_cols=["event_id"]
    ).collect()
    # the torn frame is filtered (reference skips malformed, readport.py:490)
    assert [r["event_id"] for r in out] == [1]
    r = out[0]
    # values from the reference's own expected dict (tests/test_parser.py:24)
    assert r["u"] == pytest.approx(0.079)
    assert r["v"] == pytest.approx(-0.102)
    assert r["w"] == pytest.approx(0.095)
    assert r["temp"] == pytest.approx(14.94)
    assert r["time"] == 100.0


def test_torn_frame_routes_to_corrupt(binary_frames):
    out = extract_lines(
        _decoded(binary_frames),
        GILL_PROFILE,
        keep_corrupt=True,
        extra_cols=["event_id"],
    ).collect()
    flags = {r["event_id"]: r["_corrupt"] for r in out}
    assert flags == {1: False, 2: True}


def test_decode_roundtrip_preserves_every_byte(spark):
    # bijection check across the full byte range, incl. \x02 framing
    data = bytes(range(256))
    df = spark.createDataFrame([(bytearray(data),)], "raw binary")
    s = df.select(
        F.encode(F.decode(F.col("raw"), "ISO-8859-1"), "ISO-8859-1").alias(
            "back"
        )
    ).first()
    assert bytes(s["back"]) == data
