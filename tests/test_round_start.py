"""Mechanized rotation swap (VERDICT r14 #2): _DEFER_TO_TAIL is a fully
determined function of the latest CORRECTNESS_r*.json — round_start must
generate it, verify the committed list char-exact, and catch a synthetic
mis-rotation at round start rather than at close."""

from __future__ import annotations

import ast
import json
import os

from tools import round_start
from tower_parse_spark.queries import _DEFER_TO_TAIL, registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_defer_list_matches_latest_driver_window():
    """The committed _DEFER_TO_TAIL == the latest CORRECTNESS file's key
    list, order included (the wholesale alternation: last round's driver
    window defers this round)."""
    rnd, keys = round_start.latest_correctness_keys(REPO)
    assert list(_DEFER_TO_TAIL) == keys
    state = round_start.defer_swap_state(REPO)
    assert state == {"ok": True, "source_round": rnd, "entries": len(keys)}


def test_emit_defer_block_is_paste_exact():
    """--emit-defer output parses back to exactly the expected list, so
    pasting it into queries/__init__.py can never introduce a typo."""
    block = round_start.emit_defer_block(REPO)
    # strip the provenance comment, parse the assignment
    stmt = "\n".join(
        ln for ln in block.splitlines() if not ln.startswith("#")
    )
    tree = ast.parse(stmt)
    (assign,) = tree.body
    assert assign.targets[0].id == "_DEFER_TO_TAIL"
    assert ast.literal_eval(assign.value) == round_start.expected_defer_list(REPO)


def test_synthetic_mis_rotation_is_caught(tmp_path):
    """A defer list that disagrees with the latest CORRECTNESS file —
    one name swapped for a window query (typo / stale paste) — must be
    flagged with the offending names, not silently accepted."""
    good = round_start.expected_defer_list(REPO)
    window = [q for q in registry() if q not in good]
    bad = [window[0]] + good[1:]  # drop one deferred name, add a window one
    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(json.dumps({k: {"rows_match": True} for k in bad}))
    # committed list (== `good`) vs the synthetic artifact (== `bad`)
    state = round_start.defer_swap_state(str(tmp_path))
    assert state["ok"] is False
    assert state["source_round"] == 99
    assert state["missing_from_defer"] == [window[0]]
    assert state["unexpected_in_defer"] == [good[0]]


def test_synthetic_order_mismatch_is_caught(tmp_path):
    """Same names, wrong order, is still a mis-rotation — the driver
    checks the window in registry order, so order is part of the
    contract."""
    good = round_start.expected_defer_list(REPO)
    shuffled = list(reversed(good))
    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(json.dumps({k: {"rows_match": True} for k in shuffled}))
    state = round_start.defer_swap_state(str(tmp_path))
    assert state["ok"] is False
    assert state["order_mismatch"] is True


def test_latest_correctness_picks_numeric_max(tmp_path):
    """Round selection parses the round number (r9 < r10 < r100), never
    lexicographic filename order."""
    for rnd, keys in [(9, ["a"]), (10, ["b"]), (2, ["c"])]:
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({k: {} for k in keys})
        )
    rnd, keys = round_start.latest_correctness_keys(str(tmp_path))
    assert (rnd, keys) == (10, ["b"])
