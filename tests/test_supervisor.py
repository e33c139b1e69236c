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
