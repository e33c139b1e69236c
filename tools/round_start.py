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

Prints one JSON object combining all three, exits non-zero if the
rotation is stale, the adjudication found regressions, or the digest
record is missing/incomplete (a reminder, not a build failure).
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

    print(json.dumps(out))
    rotation_ok = bool(out["rotation"].get("ok"))
    regressions = out["bench"].get("regressions") or []
    digests_ok = bool(out["plan_digests"].get("ok"))
    return 0 if rotation_ok and not regressions and digests_ok else 1


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
