#!/usr/bin/env python
"""Mechanical check of the driver-window rotation invariant.

The registry policy (COVERAGE.md rotation sections): every registry
query's LATEST driver-green CORRECTNESS row must be at most two rounds
old, and queries never seen by the driver must be new this round
(in-window, awaiting first evidence). The judge re-derives this by
diffing CORRECTNESS files each round; this script does it mechanically.

Usage: python tools/rotation_check.py [--next-round N]
  --next-round N  evaluate as if the round-N driver run will check the
                  CURRENT window (default: latest CORRECTNESS round + 1)
                  — i.e. "after the upcoming run, will every query be
                  green within the last two rounds?"

Prints one JSON line {"ok": bool, "latest_green": {...}, "stale": [...],
"never_green": [...]} and exits non-zero when the invariant would break.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    next_round = None
    for a in sys.argv[1:]:
        if a.startswith("--next-round"):
            next_round = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

    from tower_parse_spark.queries import registry

    names = list(registry())
    window = set(names[:50])

    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        data = json.load(open(path))
        for q, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    if not rounds:
        print(json.dumps({"ok": False, "error": "no CORRECTNESS files"}))
        return 2
    upcoming = next_round or (max(rounds) + 1)

    # after the upcoming driver run, window queries are green at
    # `upcoming`; everything else keeps its recorded latest
    projected = {q: latest.get(q, 0) for q in names}
    for q in window:
        projected[q] = upcoming

    stale = sorted(
        q for q, r in projected.items() if 0 < r < upcoming - 1
    )
    never = sorted(q for q, r in projected.items() if r == 0)
    ok = not stale and not never
    print(
        json.dumps(
            {
                "ok": ok,
                "upcoming_round": upcoming,
                "registry": len(names),
                "window": len(window),
                "stale_after_run": stale,
                "never_green_after_run": never,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
