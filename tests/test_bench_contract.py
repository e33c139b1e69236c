"""The bench driver-contract line (bench.py::compact_line).

The driver's stdout tail keeps ~2 kB and parses the FINAL line; round 5
lost its external perf artifact when the line overflowed. These tests
pin the budget against registry growth: at 100+ queries the line must
truncate to the slowest-40 form, stay parseable, keep the exact total,
and carry the queries_truncated marker (VERDICT r6 item 7). No Spark
session involved.
"""

from __future__ import annotations

import json

import bench


def _times(n: int) -> dict[str, float]:
    # realistic name lengths (the registry averages ~20 chars) and a
    # spread of magnitudes so the slowest-40 cut is meaningful
    return {
        f"synthetic_query_name_number_{i:03d}": round(0.123 + i * 0.37, 3)
        for i in range(n)
    }


def test_small_registry_line_is_complete_and_parseable():
    times = _times(40)
    line = bench.compact_line(times, sum(times.values()), 0.1)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"] == times
    assert "queries_truncated" not in parsed
    assert parsed["metric"] == "headline_queries_total"


def test_oversize_registry_truncates_within_budget():
    times = _times(120)
    total = round(sum(times.values()), 3)
    line = bench.compact_line(times, total, 0.1)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)
    # graceful degradation: marker counts exactly the shed queries, and
    # only the FASTEST were shed — every kept timing >= every dropped one
    assert parsed["queries_truncated"] == 120 - len(parsed["queries"])
    assert len(parsed["queries"]) >= 40
    # total stays the FULL total, not the kept subset's
    assert parsed["value"] == total
    kept_min = min(parsed["queries"].values())
    dropped_max = max(
        round(v, 2) for k, v in times.items() if k not in parsed["queries"]
    )
    assert kept_min >= dropped_max


def test_moderate_overflow_keeps_every_query_at_2dp():
    """Just past the budget, the 2-decimal re-round must absorb the
    overflow WITHOUT dropping any query — the current ~67-query registry
    shape (names ~18 chars, 3dp timings)."""
    times = {f"realistic_name_{i:04d}": 3.141 for i in range(66)}
    full_3dp = len(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": 207.3,
                "unit": "sec",
                "queries": times,
                "sf": 0.1,
            },
            separators=(",", ":"),
        )
    )
    assert full_3dp > bench.COMPACT_LINE_BUDGET  # the case under test
    line = bench.compact_line(times, 207.306, 0.1)
    parsed = json.loads(line)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    assert "queries_truncated" not in parsed
    assert len(parsed["queries"]) == 66
    assert all(v == 3.14 for v in parsed["queries"].values())


def test_current_headline_set_fits_untruncated():
    """The real headline list at realistic timings must not need the
    degraded form — if this starts failing, trim HEADLINE or widen the
    driver contract deliberately, not by accident."""
    times = {name: 3.141 for name in bench.HEADLINE}
    line = bench.compact_line(times, sum(times.values()), 0.1)
    parsed = json.loads(line)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    assert "queries_truncated" not in parsed
