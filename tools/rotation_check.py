#!/usr/bin/env python
"""Mechanical check of the driver-window rotation invariant.

The registry policy (COVERAGE.md rotation sections): every registry
query's LATEST driver-green CORRECTNESS row must be at most two rounds
old, and queries never seen by the driver must be new this round
(in-window, awaiting first evidence). The judge re-derives this by
diffing CORRECTNESS files each round; this script does it mechanically.

Usage: python tools/rotation_check.py [--next-round N] [--plan-drift]
  --next-round N  evaluate as if the round-N driver run will check the
                  CURRENT window (default: latest CORRECTNESS round + 1)
                  — i.e. "after the upcoming run, will every query be
                  green within the last two rounds?"
  --plan-drift    ALSO recompute the optimized-plan digest of every
                  DEFERRED query (tools/plan_digest.py, needs a Spark
                  session + sf0.001 fixtures) and compare against the
                  committed PLAN_DIGESTS.json: a deferred query whose
                  plan changed since that record is RED (ADVICE r12 #1
                  / VERDICT r13 #5 — plan rewrites must ride in the
                  driver window, where the round's CORRECTNESS file
                  covers them; the wholesale alternation satisfied the
                  rule by luck until now). Run at round close, then
                  refresh the record with `plan_digest.py --write`.

Prints one JSON line {"ok": bool, "latest_green": {...}, "stale": [...],
"never_green": [...], "plan_drift": [...]} and exits non-zero when the
invariant would break.
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
    out = {
        "ok": not stale and not never,
        "upcoming_round": upcoming,
        "registry": len(names),
        "window": len(window),
        "stale_after_run": stale,
        "never_green_after_run": never,
    }

    if "--plan-drift" in sys.argv:
        drift = plan_drift(names, window)
        out["plan_drift"] = drift
        out["ok"] = out["ok"] and not drift
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def plan_drift(
    names: "list[str]", window: "set[str]", digest_path: "str | None" = None
) -> "list[str]":
    """Deferred (out-of-window) queries whose optimized-plan digest no
    longer matches the committed PLAN_DIGESTS.json — each is a plan
    rewrite about to escape driver verification and must rotate into
    the window (or the rewrite must wait a round). A missing record or
    a query absent from it is treated as drift for deferred queries —
    the record must be refreshed (`plan_digest.py --write`) every round
    AFTER this check passes, never before."""
    from tools import plan_digest as PD

    path = digest_path or PD.DIGEST_FILE
    try:
        with open(path) as f:
            doc = json.load(f)
        recorded = doc["digests"]
    except (OSError, ValueError, KeyError):
        # no record at all: every deferred query is unverifiable —
        # surface that loudly rather than passing vacuously
        return sorted(q for q in names if q not in window)

    deferred = [q for q in names if q not in window]
    from tower_parse_spark.session import get_spark

    spark = get_spark("rotation_plan_drift")
    spark.sparkContext.setLogLevel("ERROR")
    # recompute at the SAME sf_dir the record was written against (the
    # record stores it): comparing digests across fixture scales would
    # flag scale-coupled plan strings as false drift
    current = PD.compute_digests(
        spark, sf_dir=doc.get("sf_dir", PD.DEFAULT_SF_DIR), names=deferred
    )
    return sorted(
        q
        for q in deferred
        if recorded.get(q) != current.get(q)
    )


if __name__ == "__main__":
    raise SystemExit(main())
