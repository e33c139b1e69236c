#!/usr/bin/env python
"""Round-start checklist (r11, VERDICT r10 #2's standing rule): run this
FIRST each round, before touching code.

1. Rotation state: tools/rotation_check.py — is the upcoming driver
   window free of going-stale entries? (`ok: true` after executing the
   round's _DEFER_TO_TAIL swap.)
2. Driver-artifact bench adjudication: bench_regress over the latest
   two BENCH_r*.json files — the comparison the close-time local run
   cannot make because the newer artifact lands only after close. Every
   surviving regression must be adjudicated in SCALE.md (deliberate
   feature cost, noise shown by a standalone interleaved re-time, or a
   fix).
3. Plan-digest record state (r14, VERDICT r13 #5, STATIC — no Spark):
   PLAN_DIGESTS.json must exist and cover every registry query, or the
   close-time `rotation_check --plan-drift` gate has nothing to compare
   against (a missing/stale record reads every deferred query as
   drift). The full drift RECOMPUTE runs at round close; this is the
   cheap don't-forget witness at round start.
4. Defer-list verification (r15, VERDICT r14 #2, STATIC — no Spark):
   the wholesale alternation is a fully determined function of the
   latest CORRECTNESS_r*.json — its key list, in driver order, IS the
   next `_DEFER_TO_TAIL`. This check compares the committed list
   char-exact against that expectation so a hand-edit typo is caught at
   round start, not at close. `--emit-defer` prints the expected block
   to paste into queries/__init__.py.

Prints one JSON object combining all four, exits non-zero if the
rotation is stale, the defer list mismatches, the adjudication found
regressions, or the digest record is missing/incomplete (a reminder,
not a build failure).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    if "--emit-defer" in sys.argv:
        print(emit_defer_block())
        return 0
    out: dict = {}
    rot = subprocess.run(
        [sys.executable, os.path.join(HERE, "rotation_check.py")],
        capture_output=True,
        text=True,
    )
    try:
        out["rotation"] = json.loads(rot.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        out["rotation"] = {"ok": False, "error": rot.stderr[-500:]}

    # order by parsed round number, not filename: lexicographic order
    # breaks at r100 ('BENCH_r100.json' sorts before 'BENCH_r11.json');
    # unparseable names are dropped rather than crashing the key
    arts = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        ),
        key=lambda p: int(
            re.search(r"r(\d+)", os.path.basename(p)).group(1)
        ),
    )
    if len(arts) < 2:
        out["bench"] = {"skipped": "fewer than two BENCH_r*.json artifacts"}
    else:
        reg = subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "bench_regress.py"),
                arts[-2],
                arts[-1],
            ],
            capture_output=True,
            text=True,
        )
        try:
            out["bench"] = json.loads(reg.stdout.strip().splitlines()[-1])
            out["bench"]["compared"] = [
                os.path.basename(arts[-2]),
                os.path.basename(arts[-1]),
            ]
        except (ValueError, IndexError):
            out["bench"] = {"error": reg.stderr[-500:]}

    out["plan_digests"] = plan_digest_state()
    out["defer_swap"] = defer_swap_state()

    print(json.dumps(out))
    rotation_ok = bool(out["rotation"].get("ok"))
    regressions = out["bench"].get("regressions") or []
    digests_ok = bool(out["plan_digests"].get("ok"))
    swap_ok = bool(out["defer_swap"].get("ok"))
    return 0 if rotation_ok and not regressions and digests_ok and swap_ok else 1


def latest_correctness_keys(repo: str = REPO) -> "tuple[int, list[str]]":
    """(round, key list in driver order) from the newest CORRECTNESS_r*.json.

    The driver writes keys in the order it checked them (the window's
    registry order), and json.load preserves insertion order — so this
    list IS the next round's expected _DEFER_TO_TAIL under the wholesale
    alternation."""
    arts = {}
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p))
        if m:
            arts[int(m.group(1))] = p
    if not arts:
        raise FileNotFoundError("no CORRECTNESS_r*.json artifacts")
    rnd = max(arts)
    with open(arts[rnd]) as f:
        return rnd, list(json.load(f))


def expected_defer_list(repo: str = REPO) -> "list[str]":
    return latest_correctness_keys(repo)[1]


def defer_swap_state(repo: str = REPO) -> dict:
    """Char-exact comparison of the committed _DEFER_TO_TAIL against the
    latest CORRECTNESS file's key order (VERDICT r14 #2: the alternation
    is a determined function of that file; a hand-edit typo must be
    caught at round start)."""
    sys.path.insert(0, repo)
    try:
        from tower_parse_spark.queries import _DEFER_TO_TAIL
    except ImportError as exc:
        return {"ok": False, "error": f"cannot import _DEFER_TO_TAIL: {exc}"}
    try:
        rnd, expected = latest_correctness_keys(repo)
    except (OSError, ValueError) as exc:
        return {"ok": False, "error": str(exc)}
    committed = list(_DEFER_TO_TAIL)
    if committed == expected:
        return {"ok": True, "source_round": rnd, "entries": len(expected)}
    missing = [q for q in expected if q not in committed]
    extra = [q for q in committed if q not in expected]
    return {
        "ok": False,
        "source_round": rnd,
        "expected_entries": len(expected),
        "committed_entries": len(committed),
        "missing_from_defer": missing,
        "unexpected_in_defer": extra,
        "order_mismatch": not missing and not extra,
        "hint": "run `python tools/round_start.py --emit-defer` and paste",
    }


def emit_defer_block(repo: str = REPO) -> str:
    """The exact _DEFER_TO_TAIL block queries/__init__.py should carry."""
    rnd, keys = latest_correctness_keys(repo)
    body = "\n".join(f"    '{k}'," for k in keys)
    return (
        f"# generated by tools/round_start.py --emit-defer from "
        f"CORRECTNESS_r{rnd:02d}.json\n_DEFER_TO_TAIL = [\n{body}\n]"
    )


def plan_digest_state() -> dict:
    """Static check that the committed PLAN_DIGESTS.json covers the
    current registry (existence + key coverage only — the expensive
    digest recompute belongs to the round-CLOSE `rotation_check
    --plan-drift` run)."""
    path = os.path.join(REPO, "PLAN_DIGESTS.json")
    try:
        with open(path) as f:
            recorded = set(json.load(f)["digests"])
    except (OSError, ValueError, KeyError) as exc:
        return {"ok": False, "error": f"unreadable {path}: {exc}"}
    sys.path.insert(0, REPO)
    from tower_parse_spark.queries import registry

    names = set(registry())
    missing = sorted(names - recorded)
    return {
        "ok": not missing,
        "recorded": len(recorded),
        "registry": len(names),
        "missing": missing,
        "stale_extra": sorted(recorded - names),
    }


if __name__ == "__main__":
    raise SystemExit(main())
