"""Restart supervision control flow (A2 reconnect parity) — unit-tested
with fake queries so the retry/backoff logic is exact."""

from __future__ import annotations

import pytest

from tower_parse_spark.streaming.pipeline import run_supervised


class FakeQuery:
    def __init__(self, fail: bool):
        self.fail = fail

    def awaitTermination(self):
        if self.fail:
            raise RuntimeError("stream died")


def test_restarts_then_succeeds():
    calls = []

    def start():
        calls.append(1)
        return FakeQuery(fail=len(calls) < 3)  # dies twice, then clean

    slept = []
    restarts = run_supervised(start, max_restarts=5, sleep=slept.append)
    assert restarts == 2
    assert len(calls) == 3
    assert slept == [1.0, 2.0]  # linear backoff


def test_gives_up_after_max_restarts():
    def start():
        return FakeQuery(fail=True)

    with pytest.raises(RuntimeError, match="stream died"):
        run_supervised(start, max_restarts=2, sleep=lambda s: None)


def test_clean_stop_no_restart():
    assert run_supervised(lambda: FakeQuery(fail=False)) == 0


class FakeProgressQuery:
    def __init__(self, progress, active=True):
        self.recentProgress = progress
        self.isActive = active
        self.stopped = False

    def stop(self):
        self.stopped = True
        self.isActive = False


def _prog(ts: str, rows: int):
    return {"timestamp": ts, "numInputRows": rows}


def test_is_idle_no_progress():
    from tower_parse_spark.streaming.pipeline import is_idle

    assert is_idle(FakeProgressQuery([]), timeout_s=5)


def test_is_idle_uses_last_active_trigger():
    from tower_parse_spark.streaming.pipeline import is_idle

    q = FakeProgressQuery(
        [
            _prog("2026-01-01T00:00:00.000Z", 10),
            _prog("2026-01-01T00:00:30.000Z", 0),  # empty triggers keep coming
        ]
    )
    t0 = 1767225600000  # 2026-01-01T00:00:00Z in epoch ms
    # 4s after the active trigger: alive
    assert not is_idle(q, timeout_s=5, now_ms=t0 + 4000)
    # 6s after the active trigger: idle despite recent empty triggers
    assert is_idle(q, timeout_s=5, now_ms=t0 + 6000)


def test_watch_idle_stops_stalled_query():
    from tower_parse_spark.streaming.pipeline import watch_idle

    q = FakeProgressQuery([])  # never any progress -> idle immediately
    watch_idle(q, timeout_s=0.1, sleep=lambda s: None)
    assert q.stopped
