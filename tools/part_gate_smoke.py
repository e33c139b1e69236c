#!/usr/bin/env python
"""Partitioned band-gate A/B at ~10M index keys (VERDICT r12 #3 done
condition): measure the probe work the partitioned (_bloom_part) gate
saves vs the ungated path, at a key count the LITERAL gate can no
longer serve (10M keys size to ~96 Mbit, over MAX_GATE_BITS=2^26).

Setup: a synthetic banded-signature index of N band keys written to
parquet (band keys + small mh arrays — shingling real documents at
this scale would time the shingler, not the probe), its partitioned
bloom delta cut by bloom_delta_words at the fixed PART_GATE geometry,
and a mostly-novel probe batch (real docs run through the REAL
banded_signatures path; novel_frac of them share no band key with the
index). Timed, interleaved best-of-R with gc between samples (the
bench A/B discipline): the full verdict computation of
incremental_minhash_dedup_with_banded, part-gated vs ungated.

Prints one JSON line; numbers land in SCALE.md.

Usage: python tools/part_gate_smoke.py [index_keys] [batch_docs] [reps]
       [--cold]

``--cold`` (r14, VERDICT r13 #4): evict the index and gate parquet
files from the OS page cache (sync + posix_fadvise DONTNEED, no
privileges needed) before EVERY timed sample, in both arms equally.
local[32] cannot demonstrate the past-the-cliff structural claim warm —
at ~60M keys (~12 GB index) the arms thrash the cache unevenly and the
spread blows out (SCALE.md r13) — but a 1000-executor cluster reads the
index from distributed storage where neither arm gets it for free;
cold-per-sample is the local stand-in for that IO symmetry.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tower_parse_spark.operators import bloom as B  # noqa: E402
from tower_parse_spark.operators.dedup import (  # noqa: E402
    banded_signatures,
    incremental_minhash_dedup_with_banded,
)
from tower_parse_spark.session import get_spark  # noqa: E402


def _evict_page_cache(*dirs: str) -> None:
    """Drop every file under *dirs* from the OS page cache: sync (so
    dirty pages become evictable) then POSIX_FADV_DONTNEED per file.
    Unprivileged, Linux; makes the next read pay real IO — the local
    stand-in for a cluster reading the index from distributed
    storage."""
    os.sync()
    for d in dirs:
        for root, _sub, files in os.walk(d):
            for fn in files:
                p = os.path.join(root, fn)
                try:
                    fd = os.open(p, os.O_RDONLY)
                except OSError:
                    continue
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                finally:
                    os.close(fd)


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv
    n_keys = int(pos[0]) if len(pos) > 0 else 10_000_000
    batch_docs = int(pos[1]) if len(pos) > 1 else 2_000
    reps = int(pos[2]) if len(pos) > 2 else 3
    spark = get_spark("part_gate_smoke")
    work = tempfile.mkdtemp(prefix="part_gate_smoke_")
    out: dict = {
        "index_keys": n_keys,
        "batch_docs": batch_docs,
        "reps": reps,
        "cold": cold,
    }
    try:
        # --- synthetic index: n_keys banded rows, real schema ---
        idx_path = os.path.join(work, "idx")
        (
            spark.range(0, n_keys, 1, 32)
            .select(
                # realistic row shape: band keys the width real banding
                # produces, mh at the real LSH_BANDS*LSH_ROWS=16 longs —
                # an artificially narrow index under-prices the ungated
                # scan and overstates the gate's relative cost
                F.concat(
                    F.pmod(F.col("id"), F.lit(4)).cast("string"),
                    F.lit(":"),
                    F.xxhash64("id").cast("string"),
                    F.lit(":ix"),
                ).alias("band_key"),
                F.col("id").alias("doc_id"),
                F.array(
                    *[F.xxhash64("id", F.lit(j)) for j in range(16)]
                ).alias("mh"),
                F.lit("fast").alias("hash_fn"),
            )
            .write.mode("overwrite")
            .parquet(idx_path)
        )
        index = spark.read.parquet(idx_path)

        # --- partitioned gate: delta over the index keys, fixed geometry ---
        t0 = time.monotonic()
        words_path = os.path.join(work, "words")
        B.bloom_delta_words(index.select("band_key"), "band_key").write.mode(
            "overwrite"
        ).parquet(words_path)
        out["gate_build_sec"] = round(time.monotonic() - t0, 2)
        words = spark.read.parquet(words_path)
        out["gate_words"] = words.count()
        out["gate_fp_est"] = round(
            B.bloom_fp_rate(n_keys, B.PART_GATE_BITS, B.PART_GATE_HASHES), 5
        )

        # --- probe batch: real docs through the real banding path ---
        batch = (
            spark.range(0, batch_docs, 1, 8)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"w{j}_"),
                            F.pmod(F.xxhash64("id", F.lit(j)), F.lit(50_000)),
                        )
                        for j in range(30)
                    ],
                ).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        banded = banded_signatures(batch, "doc_id", "text")
        # make ~10% of the batch TRUE history dups: their banded rows
        # (real band keys, real mh) join the synthetic index under
        # shifted doc ids, so the gate must pass them through and the
        # verdict check exercises real matches, not just novel passes
        dup_rows = banded.filter(
            F.col("doc_id") < int(0.1 * batch_docs)
        ).select(
            "band_key",
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "mh",
            "hash_fn",
        )
        dup_rows.write.mode("append").parquet(idx_path)
        index = spark.read.parquet(idx_path)
        B.bloom_delta_words(dup_rows.select("band_key"), "band_key").write.mode(
            "append"
        ).parquet(words_path)
        # raw un-merged deltas, exactly what read_part_gate hands the
        # probe (part_gate_filter's bit test is EXISTS-over-rows)
        words = spark.read.parquet(words_path)
        n_banded = banded.count()
        gated_rows = B.part_gate_filter(
            banded, "band_key", words, B.PART_GATE_BITS, B.PART_GATE_HASHES
        ).count()
        out["batch_banded_rows"] = n_banded
        out["gate_survivor_rows"] = gated_rows
        out["gate_skip_pct"] = round(100.0 * (1 - gated_rows / n_banded), 2)

        def run(part_gate) -> None:
            verdicts, _ = incremental_minhash_dedup_with_banded(
                batch, index, part_gate=part_gate
            )
            verdicts.write.format("noop").mode("overwrite").save()

        pg = (words, B.PART_GATE_BITS, B.PART_GATE_HASHES)
        run(None)  # warm-up
        run(pg)
        gc.collect()
        samples: dict[str, list[float]] = {"ungated": [], "part_gated": []}
        for _ in range(reps):  # interleaved: machine drift cancels
            for mode, gate in (("ungated", None), ("part_gated", pg)):
                if cold:
                    _evict_page_cache(idx_path, words_path)
                t0 = time.monotonic()
                run(gate)
                samples[mode].append(round(time.monotonic() - t0, 3))
                gc.collect()
        out["samples"] = samples
        out["best"] = {k: min(v) for k, v in samples.items()}
        out["speedup_best"] = round(
            out["best"]["ungated"] / out["best"]["part_gated"], 2
        )
        # verdict identity at this scale (rows + dup counts)
        v_u, _ = incremental_minhash_dedup_with_banded(batch, index)
        v_g, _ = incremental_minhash_dedup_with_banded(
            batch, index, part_gate=pg
        )
        agg = lambda v: v.agg(  # noqa: E731
            F.count(F.lit(1)),
            F.sum(F.col("is_dup").cast("long")),
            F.sum(F.col("in_batch_dup").cast("long")),
        ).collect()[0]
        out["verdict_identical"] = list(agg(v_u)) == list(agg(v_g))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
