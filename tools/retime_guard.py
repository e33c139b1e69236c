"""Standalone guard-on/off A/B for the single-split guard on the passage
fronts (VERDICT r10 #2): times dedup_passages and boilerplate_removal at
sf0.1 with the input guard REINSTATED vs the shipped guard-free plan.

Post-r11 the operators themselves no longer call ensure_parallelism
(the measurement this tool produced was the evidence for dropping it),
so guard_on cannot be "leave the code alone": it wraps the operator to
run ensure_parallelism on the staged input first — the exact pre-r11
call shape — while guard_off times the shipped plan. (A first post-r11
revision patched dedup_mod.ensure_parallelism, which nothing calls any
more: both modes timed the identical plan and the A/B was vacuous —
ADVICE r11.) Modes are INTERLEAVED (on, off, on, off, ...) so machine
drift cancels, and gc.collect() runs between samples (bench.py's rule —
the JVM frees a run's localCheckpoint blocks only when the Python
DataFrame is collected; without it later samples time earlier samples'
memory pressure). Best-of-4 per mode; one JSON line.

Round-11 finding recorded here for posterity: a first version of this
script also "A/B-ed" token_count_bpe and sequence_packing and saw
1.2-1.5x deltas — but a call-site spy showed NEITHER query reaches
ensure_parallelism at all (token_count_bpe builds its plan inline;
sequence_packing's fold path has no guard site). Identical code timed
1.5x apart across consecutive un-gc'd best-of-3 batches: that is the
noise floor this harness has without interleaving + gc, and why
bench_regress gates on cal-adjusted ratios instead of raw pairs.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tower_parse_spark.session import get_spark  # noqa: E402
import tower_parse_spark.operators.dedup as dedup_mod  # noqa: E402

ROUNDS = 4


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("retime-guard")
    materialize(qs["dedup_passages"](spark, sf_dir))  # warm-up
    gc.collect()

    from tower_parse_spark.session import ensure_parallelism

    # guard_on reinstates the pre-r11 shape: guard the staged input of
    # the operator itself (the queries call dedup_mod.<op> through the
    # module attribute, so patching the attribute changes the plan)
    ops = {
        "dedup_passages": "passage_dedup",
        "boilerplate_removal": "boilerplate_removal",
    }
    real = {op: getattr(dedup_mod, op) for op in ops.values()}

    def guarded(fn):
        def inner(df, *a, **kw):
            return fn(ensure_parallelism(df), *a, **kw)

        return inner

    out: dict[str, dict] = {}
    for name, op in ops.items():
        runs: dict[str, list[float]] = {"guard_on": [], "guard_off": []}
        for _ in range(ROUNDS):
            for mode in ("guard_on", "guard_off"):
                setattr(
                    dedup_mod,
                    op,
                    guarded(real[op]) if mode == "guard_on" else real[op],
                )
                t0 = time.monotonic()
                materialize(qs[name](spark, sf_dir))
                runs[mode].append(round(time.monotonic() - t0, 3))
                gc.collect()
        setattr(dedup_mod, op, real[op])
        out[name] = {m: {"best": min(s), "runs": s} for m, s in runs.items()}
        out[name]["on_over_off"] = round(
            out[name]["guard_on"]["best"] / out[name]["guard_off"]["best"], 3
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
