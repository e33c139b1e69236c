"""CLI arg handling (A25 parity: --config xor --echo, endpoint checks)."""

from __future__ import annotations

import pytest

from tower_parse_spark.__main__ import build_parser, parse_endpoint


def test_modes_mutually_exclusive():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--config", "x.conf", "--echo", "h:1"])
    with pytest.raises(SystemExit):
        p.parse_args([])  # one mode required


def test_endpoint_parsing():
    assert parse_endpoint("10.0.0.1:4001") == ("10.0.0.1", 4001)
    # bracketed IPv6, like the reference's urlparse path (readport.py:748)
    assert parse_endpoint("[::1]:4001") == ("::1", 4001)
    for bad in [
        "nohost",
        ":4001",
        "h:notaport",
        "h:99999",
        "localhost:4001",  # reference requires a literal IP, not a hostname
        "10.0.0.1",  # missing port
        "10.0.0.1:0",  # port 0 rejected (falsy, same as reference assert)
    ]:
        with pytest.raises(SystemExit):
            parse_endpoint(bad)
