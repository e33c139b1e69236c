#!/usr/bin/env python
"""Automated physical-plan audit over the whole query registry.

For every ``queries()`` entry, builds the DataFrame at the given SF and
inspects the executed plan string for the scale-relevant signals:

- ``exchanges``: number of ``Exchange`` operators (shuffles; output sorts
  included) — the thing to minimize at 100 TB (AQE hides codegen spans
  until execution, so codegen presence is asserted by test_plans.py at
  runtime instead of here);
- ``python``: any ``BatchEvalPython`` (row-at-a-time Python — banned) or
  ``ArrowEvalPython``/``MapInPandas`` (Arrow-batched — allowed, expected
  only in the multimodal family);
- ``nested_loop`` / ``cartesian``: BroadcastNestedLoopJoin /
  CartesianProduct — allowed only for the brute-force ANN baseline
  (broadcast cross join IS the exact scan) and the Q22 scalar-threshold
  shape (cross join against a broadcast one-row aggregate).

Prints one summary line per query plus a final verdict; exits non-zero
if a banned pattern appears outside its allowlist. Writes the full
table as markdown when ``--md=PATH`` is given.

Usage: python tools/plan_audit.py [sf_dir] [--md=PLAN_AUDIT.md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tower_parse_spark.session import get_spark  # noqa: E402

#: broadcast cross join IS the exact brute-force scan for the ANN
#: baseline; the Q22 shape compares against a broadcast ONE-ROW scalar
#: aggregate (O(n*1), the canonical scalar-subquery plan)
NESTED_LOOP_OK = {
    "ann_cosine_topk",  # the exact brute-force baseline IS a cross join
    "wealthy_inactive_customers",  # Q22 one-row scalar-threshold join
    "q11_important_parts",  # Q11 one-row global-share-threshold join
    "text_tfidf_topterms",  # one-row broadcast N (corpus doc count) for the idf
    "domain_reweight",  # two one-row broadcasts (total tokens; normalizer+max-rate)
    "perplexity_filter",  # one-row broadcasts: vocab V (LM build) + unk penalty
    "quality_classifier",  # one-row broadcasts: class totals (NB train) + consts row
    "text_langid",  # r9 trained-NB half: one-row broadcasts of the class
    # totals (train) + consts row (score) — the quality_classifier shape
}

#: Arrow-batched Python is the designed path for binary decode only
ARROW_OK_PREFIX = ("multimodal_",)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--md=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("plan_audit")

    rows = []
    bad = []
    for name, fn in qs.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 - audit must finish
            rows.append((name, None, "ERROR", str(exc)[:80]))
            bad.append((name, "plan build failed"))
            continue
        exchanges = plan.count("Exchange ")
        row_python = "BatchEvalPython" in plan
        arrow_python = (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        )
        nested = "BroadcastNestedLoopJoin" in plan
        cartesian = "CartesianProduct" in plan
        notes = []
        if row_python:
            notes.append("ROW-PYTHON")
            bad.append((name, "BatchEvalPython (row-at-a-time Python)"))
        if arrow_python:
            if name.startswith(ARROW_OK_PREFIX):
                notes.append("arrow")
            else:
                notes.append("ARROW-UNEXPECTED")
                bad.append((name, "Arrow Python outside multimodal"))
        if cartesian:
            notes.append("CARTESIAN")
            bad.append((name, "CartesianProduct"))
        if nested:
            if name in NESTED_LOOP_OK:
                notes.append("bnlj:baseline")
            else:
                notes.append("BNLJ")
                bad.append((name, "BroadcastNestedLoopJoin"))
        rows.append(
            (
                name,
                exchanges,
                "ok" if not any(n.isupper() for n in notes) else "FLAG",
                ",".join(notes) or "-",
            )
        )
        print(f"{name}: exchanges={exchanges} {','.join(notes) or 'clean'}")

    if md_path:
        with open(md_path, "w") as f:
            f.write(
                "# PLAN AUDIT — all registry queries at "
                f"{os.path.basename(sf_dir)}\n\n"
                "Automated sweep (tools/plan_audit.py): shuffle counts and\n"
                "banned-operator scan for every registered query. Allowed\n"
                "exceptions: the ANN baseline's broadcast cross join, the\n"
                "Q22 one-row scalar-threshold cross join, and Arrow-batched\n"
                "Python in the multimodal family.\n\n"
                "| query | exchanges | verdict | notes |\n"
                "|---|---|---|---|\n"
            )
            for r in rows:
                f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    if bad:
        print(f"\nFLAGGED: {bad}")
        return 1
    print(f"\nall {len(rows)} query plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
