#!/usr/bin/env python
"""Normalized optimized-plan digests for every registry query.

The mechanical form of ADVICE r12 #1 / VERDICT r13 #5: "a query whose
executed plan changed this round must not sit deferred out of the
driver window". Module-level diffing is too coarse (a maintenance
function and a query plan share files all over this repo), so the rule
keys on the thing it actually protects: the OPTIMIZED LOGICAL PLAN of
each registry query, digested after normalizing run-varying noise
(expression ids, temp/table paths). The committed ``PLAN_DIGESTS.json``
is the previous round's record; ``rotation_check.py --plan-drift``
recomputes digests for the DEFERRED queries only and goes red when one
changed — plan rewrites must ride IN the driver window, where the
round's CORRECTNESS file covers them.

The digest is structural, not semantic: two textually different plans
that compute the same thing count as drift (fine — drift forces a
window seat, never hides one), and the normalization keeps byte-level
noise out (re-running on unchanged code digests identically —
pytest-pinned in test_plan_digest.py).

Streaming-family queries run their micro-batch loop inside the
callable and return a batch DataFrame over the results; their digest
covers that returned scan (shape + schema), not the epoch plans — the
epoch plans are audited by plan_audit.py's streaming section, and any
change to the streaming modules shows up here through the result
relation when it changes shape, or lands in-window by the wholesale
rotation anyway.

Usage:
  python tools/plan_digest.py [sf_dir]            # print digests
  python tools/plan_digest.py [sf_dir] --write    # refresh PLAN_DIGESTS.json
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIGEST_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_DIGESTS.json",
)

#: default SF for digesting — smallest on-disk fixture, plans are
#: data-size-independent at the logical level
DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def normalize_plan(s: str) -> str:
    """Strip run-varying noise from an optimized-plan string so the
    digest moves only with plan STRUCTURE: expression ids (#123 differ
    per session), absolute paths (temp dirs for streaming outputs,
    fixture roots), and object addresses."""
    s = re.sub(r"#\d+", "#", s)
    # higher-order-function lambda variables carry a SESSION-GLOBAL
    # counter (lambda x_9 vs lambda x_21 for the same plan, depending
    # on what ran earlier in the session) — normalize the ordinal the
    # same way as expression ids
    s = re.sub(r"\b(lambda [a-z]+)_\d+", r"\1_", s)
    # ...as does the common-subexpression alias counter (with_common_
    # expressions: _common_expr_0 vs _common_expr_16 for the same plan)
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)
    s = re.sub(r"(file:)?/(tmp|root|private/var|var/folders)/\S*", "<PATH>", s)
    s = re.sub(r"@[0-9a-f]{6,}", "@", s)
    return s


def plan_digest(df) -> str:
    """16-hex digest of the normalized optimized logical plan."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    return hashlib.sha256(normalize_plan(s).encode()).hexdigest()[:16]


def compute_digests(
    spark, sf_dir: str = DEFAULT_SF_DIR, names: "list[str] | None" = None
) -> dict:
    """Digest the optimized plan of each registry query (all by
    default, *names* to restrict). Building the DataFrame may RUN
    streaming queries' micro-batch loops (their callables return the
    results relation) — that is the cost of digesting the real
    surface; at sf0.001 the full registry is ~a minute."""
    from tower_parse_spark.queries import registry

    reg = registry()
    todo = list(reg) if names is None else [n for n in names if n in reg]
    out = {}
    for name in todo:
        df = reg[name].fn(spark, sf_dir)
        out[name] = plan_digest(df)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else DEFAULT_SF_DIR

    from tower_parse_spark.session import get_spark

    spark = get_spark("plan_digest")
    spark.sparkContext.setLogLevel("ERROR")
    digests = compute_digests(spark, sf_dir)
    if "--write" in sys.argv:
        with open(DIGEST_FILE, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "digests": dict(sorted(digests.items()))},
                f,
                indent=0,
                sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {len(digests)} digests to {DIGEST_FILE}")
    else:
        print(json.dumps(dict(sorted(digests.items()))))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
