"""Standalone guard-on/off A/B for the single-split guard on the passage
fronts (VERDICT r10 #2): times dedup_passages and boilerplate_removal at
sf0.1 with ensure_parallelism active vs patched to identity. Modes are
INTERLEAVED (on, off, on, off, ...) so machine drift cancels, and
gc.collect() runs between samples (bench.py's rule — the JVM frees a
run's localCheckpoint blocks only when the Python DataFrame is
collected; without it later samples time earlier samples' memory
pressure). Best-of-4 per mode; one JSON line.

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

    real_guard = dedup_mod.ensure_parallelism
    identity = lambda df, min_parts=None: df  # noqa: E731
    out: dict[str, dict] = {}
    for name in ("dedup_passages", "boilerplate_removal"):
        runs: dict[str, list[float]] = {"guard_on": [], "guard_off": []}
        for _ in range(ROUNDS):
            for mode, fn in (("guard_on", real_guard), ("guard_off", identity)):
                dedup_mod.ensure_parallelism = fn
                t0 = time.monotonic()
                materialize(qs[name](spark, sf_dir))
                runs[mode].append(round(time.monotonic() - t0, 3))
                gc.collect()
        out[name] = {m: {"best": min(s), "runs": s} for m, s in runs.items()}
        out[name]["on_over_off"] = round(
            out[name]["guard_on"]["best"] / out[name]["guard_off"]["best"], 3
        )
    dedup_mod.ensure_parallelism = real_guard
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
