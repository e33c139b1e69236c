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

Prints one JSON object combining both, exits non-zero if the rotation
is stale or the adjudication found regressions (a reminder to write the
SCALE.md record, not a build failure).
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

    print(json.dumps(out))
    rotation_ok = bool(out["rotation"].get("ok"))
    regressions = out["bench"].get("regressions") or []
    return 0 if rotation_ok and not regressions else 1


if __name__ == "__main__":
    raise SystemExit(main())
