#!/usr/bin/env python
"""Scale smoke: 10M-row synthetic ingest, no parquet in the way.

Generates probe lines with spark.range + format_string (distributed,
zero I/O, materialized once), then times extraction in its packed
(one-regex-execution), per-variable, and dispatched forms at 4 and 16
capture groups, plus the full extract+pack pipeline.
Prints one JSON line; numbers land in SCALE.md.

Usage: python tools/scale_smoke.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tower_parse_spark.functions.extraction import extract_lines  # noqa: E402
from tower_parse_spark.queries.ingest import PROBE_FMT, PROBE_PROFILE  # noqa: E402
from tower_parse_spark.operators.pack import with_pack_id  # noqa: E402
from tower_parse_spark.session import get_spark  # noqa: E402


def lines_df(spark, n: int):
    r = spark.range(0, n, 1, 64)
    val = (F.col("id") % 1000) / 10.0
    line = F.format_string(
        PROBE_FMT,
        (F.col("id") % 3 + 1).cast("int"),
        F.format_string("%+08.3f", val),
        -val,
        F.col("id"),
    )
    return r.select(
        F.col("id").alias("event_id"),
        (F.lit(1700000000.0) + F.col("id") / 20.0).alias("ts"),
        line.alias("line"),
    )


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale_smoke")
    # materialize the synthetic lines so timings measure extraction, not
    # the format_string generator
    src = lines_df(spark, n).localCheckpoint(eager=True)
    noop(src)  # warm-up

    from tower_parse_spark.functions import extraction as X

    def forced(df, profile, min_groups):
        prev = X.PACKED_MIN_GROUPS
        X.PACKED_MIN_GROUPS = min_groups
        try:
            return noop(extract_lines(df, profile, extra_cols=["event_id"]))
        finally:
            X.PACKED_MIN_GROUPS = prev

    one_pass = forced(src, PROBE_PROFILE, 1)  # force packed parse
    n_pass = forced(src, PROBE_PROFILE, 99)  # force per-variable extracts
    dispatched = noop(
        extract_lines(src, PROBE_PROFILE, extra_cols=["event_id"])
    )
    packed = noop(
        with_pack_id(
            extract_lines(src, PROBE_PROFILE, extra_cols=["event_id"]),
            12_000,
            None,
            ["time", "event_id"],
        )
    )

    # Wide schema (16 groups, the KLDPIO shape): one-pass vs N-pass.
    from tower_parse_spark.plans.profile import DeviceProfile

    k = 16
    wide_n = max(n // 5, 1)
    wide_fmt = " ".join(f"v{i}=%+08.3f" for i in range(k))
    wide_regex = "^" + " ".join(
        f"v{i}=(?P<g{i}>\\S+)" for i in range(k)
    ) + "$"
    wide_prof = DeviceProfile(name="wide", regex=[wide_regex])
    wsrc = (
        spark.range(0, wide_n, 1, 64)
        .select(
            F.col("id").alias("event_id"),
            (F.lit(1700000000.0) + F.col("id") / 20.0).alias("ts"),
            F.format_string(
                wide_fmt, *[(F.col("id") % 997) / (7.0 + i) for i in range(k)]
            ).alias("line"),
        )
        .localCheckpoint(eager=True)
    )
    noop(wsrc)
    wide_one = forced(wsrc, wide_prof, 1)  # packed (also the dispatch choice)
    wide_npass = forced(wsrc, wide_prof, 99)
    # Dedup at scale: MinHash+LSH candidate pairs over a replicated
    # documents corpus. Each replica's text is vowel-rotated by replica
    # index mod 5, so replicas sharing a rotation are exact duplicates
    # (controlled dup groups) and the rest don't collide — a realistic
    # duplicate density instead of an all-pairs explosion.
    from tower_parse_spark.operators.dedup import minhash_lsh_pairs
    from tower_parse_spark.session import load_table

    reps = int(os.environ.get("SMOKE_DEDUP_REPS", "100"))
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    vowels = "aeiou"
    big = docs
    for r in range(1, reps):
        rot = vowels[r % 5 :] + vowels[: r % 5]
        big = big.unionAll(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                F.translate(F.col("text"), vowels, rot).alias("text"),
            )
        )
    big = big.localCheckpoint(eager=True)
    n_docs = big.count()
    t0 = time.time()
    n_pairs = minhash_lsh_pairs(big, hash_fn="fast").count()
    dedup_sec = round(time.time() - t0, 2)

    # Passage dedup at scale: the replicated corpus repeats every passage
    # across its exact-duplicate groups, so the canonical-occurrence agg
    # sees realistic hot hashes (boilerplate shape), not unique keys.
    from tower_parse_spark.operators.dedup import passage_dedup

    t0 = time.time()
    n_passage_docs = passage_dedup(big).count()
    passage_sec = round(time.time() - t0, 2)

    # Boilerplate removal at scale: same corpus, frequency rule. With
    # reps replicas in 5 rotation groups, every passage recurs in
    # ~reps/5 distinct docs — all of it clears min_doc_freq, the
    # worst case for the threshold join-back (nothing is filtered out).
    from tower_parse_spark.operators.dedup import boilerplate_removal

    t0 = time.time()
    boiler = boilerplate_removal(big, min_doc_freq=reps // 5)
    n_boiler_docs = boiler.filter(F.col("boiler_frac") >= 1.0).count()
    boiler_sec = round(time.time() - t0, 2)
    # self-check: every doc with passages is fully template here
    assert n_boiler_docs == n_passage_docs, (n_boiler_docs, n_passage_docs)

    # Sequence packing at scale: one window cumsum over hash shards.
    from tower_parse_spark.operators.seqpack import pack_sequences

    t0 = time.time()
    n_packed = pack_sequences(big).count()
    seqpack_sec = round(time.time() - t0, 2)

    # Fuzzy decontamination at scale: the 50k-doc replicated corpus
    # against the base 500 docs as the "benchmark" — the asymmetric
    # shape (bench ≪ corpus, banded bench signatures broadcast, corpus
    # never shuffled). Every rotation-0 replica is an exact bench copy,
    # so the hit aggregation also carries real volume.
    from tower_parse_spark.operators.decontam import flag_contaminated_fuzzy

    t0 = time.time()
    fuzzy = flag_contaminated_fuzzy(big, docs, hash_fn="fast")
    n_flagged = fuzzy.filter(F.col("contaminated")).count()
    fuzzy_sec = round(time.time() - t0, 2)
    # ground truth: exactly the rotation-0 replicas (r % 5 == 0, incl.
    # the originals) are exact copies of benchmark docs — make the smoke
    # actually check itself, not just print a number
    n_expected = ((reps + 4) // 5) * docs.count()
    assert n_flagged == n_expected, (n_flagged, n_expected)

    # Incremental near-dup at scale: the 50k-doc corpus becomes a banded
    # signature INDEX once; a 500-doc daily batch (the base docs — every
    # one an exact copy of its rotation-0 replica) probes it with the
    # batch broadcast and the index streaming. Build is once-per-corpus;
    # probe is the daily cost.
    import tempfile

    from tower_parse_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
    )

    with tempfile.TemporaryDirectory() as tmp:
        idx_path = os.path.join(tmp, "mh_idx")
        t0 = time.time()
        build_minhash_index(big, idx_path)
        mh_build_sec = round(time.time() - t0, 2)
        t0 = time.time()
        n_batch_dups = (
            incremental_minhash_dedup(docs, spark.read.parquet(idx_path))
            .filter(F.col("is_dup"))
            .count()
        )
        mh_probe_sec = round(time.time() - t0, 2)

    # URL curation at scale (r7): 5M synthetic URLs over 50k domains
    # with a 10x canonical-duplication factor, mixed-case schemes/hosts,
    # default ports and tracking params. Everything but the cap rank is
    # row-local or a hash agg; the count-prefilter keeps the rank window
    # on over-cap domains only.
    from tower_parse_spark.operators.urls import curate_urls

    n_urls = 5_000_000
    r = spark.range(0, n_urls, 1, 64)
    uid = F.col("id")
    k = uid % 500_000
    host = F.concat(
        F.lit("www.d"), (k % 50_000).cast("string"), F.lit(".example.com")
    )
    url = F.concat(
        F.when(uid % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(uid % 4 == 1, F.upper(host)).otherwise(host),
        F.when(uid % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        k.cast("string"),
        F.when(
            uid % 3 == 2, F.concat(F.lit("/u"), uid.cast("string"))
        ).otherwise(F.lit("")),
        F.lit("?q=1"),
        F.when(
            uid % 3 == 1, F.lit("&utm_source=feed&fbclid=x")
        ).otherwise(F.lit("")),
    )
    urls = r.select(uid.alias("id"), url.alias("url")).localCheckpoint(
        eager=True
    )
    t0 = time.time()
    cur = curate_urls(
        urls, id_col="id", blocklist=("d7.example.com",), domain_cap=20
    )
    stats = cur.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_url_dup").cast("long")).alias("dups"),
        F.sum(F.col("blocked").cast("long")).alias("blocked"),
        F.sum(F.col("over_cap").cast("long")).alias("over"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).first()
    url_sec = round(time.time() - t0, 2)
    # self-checks: row preservation, and the blocklist hits exactly the
    # k % 50000 == 7 groups (10 k-groups x 10 ids)
    assert stats["n"] == n_urls, stats
    assert stats["blocked"] == 100, stats

    # Perceptual-hash near-dup at scale (r7): 500k payloads through the
    # Arrow hashing stage, then the Hamming-band bucket join at the
    # CORPUS-SCALE configuration — 64-bit hashes, 4x16-bit bands (the
    # default 32/4 fixture bands saturate their 256 slot values past
    # ~100k docs; see phash_near_dup_pairs). The oracle stub spreads
    # only 97 hash classes (n % 97 arithmetic — a fixture artifact), so
    # the smoke hashes CONTENT (md5-derived 64-bit) as a real dHash
    # distribution stand-in; every id % 250000 value appears twice, so
    # ground truth is exactly 250k Hamming-0 pairs — self-checked.
    import hashlib

    from tower_parse_spark.operators import multimodal as MM

    def spread64(p: bytes) -> int:
        return MM._signed64(
            int.from_bytes(hashlib.md5(p).digest()[:8], "big")
        )

    n_pay = 500_000
    pay = spark.range(0, n_pay, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.encode(
            F.concat(F.lit("img-"), (F.col("id") % 250_000).cast("string")),
            "utf-8",
        ).alias("payload"),
    )
    t0 = time.time()
    ph = MM.with_phash(pay, hasher=spread64).localCheckpoint(eager=True)
    phash_sec = round(time.time() - t0, 2)
    t0 = time.time()
    n_pairs_ph = MM.phash_near_dup_pairs(
        ph, max_hamming=0, bits=64, bands=4
    ).count()
    phash_join_sec = round(time.time() - t0, 2)
    assert n_pairs_ph == 250_000, n_pairs_ph

    print(
        json.dumps(
            {
                "rows": n,
                "url_rows": n_urls,
                "url_curation_sec": url_sec,
                "url_rows_per_sec": int(n_urls / url_sec),
                "url_dups": int(stats["dups"]),
                "url_kept": int(stats["kept"]),
                "url_over_cap": int(stats["over"]),
                "phash_rows": n_pay,
                "phash_stage_sec": phash_sec,
                "phash_rows_per_sec": int(n_pay / phash_sec),
                "phash_join_sec": phash_join_sec,
                "phash_h0_pairs": n_pairs_ph,
                "extract_packed_sec": one_pass,
                "extract_n_pass_sec": n_pass,
                "extract_dispatched_sec": dispatched,
                "extract_rows_per_sec": int(n / dispatched),
                "extract_pack_sec": packed,
                "pipeline_rows_per_sec": int(n / packed),
                "wide16_rows": wide_n,
                "wide16_one_pass_sec": wide_one,
                "wide16_n_pass_sec": wide_npass,
                "wide16_speedup": round(wide_npass / wide_one, 2),
                "dedup_docs": n_docs,
                "dedup_pairs": n_pairs,
                "dedup_lsh_sec": dedup_sec,
                "dedup_docs_per_sec": int(n_docs / dedup_sec),
                "passage_dedup_docs": n_passage_docs,
                "passage_dedup_sec": passage_sec,
                "boilerplate_docs_fully_template": n_boiler_docs,
                "boilerplate_sec": boiler_sec,
                "passage_docs_per_sec": int(n_passage_docs / passage_sec),
                "seqpack_docs": n_packed,
                "seqpack_sec": seqpack_sec,
                "seqpack_docs_per_sec": int(n_packed / seqpack_sec),
                "fuzzy_decontam_flagged": n_flagged,
                "fuzzy_decontam_sec": fuzzy_sec,
                "fuzzy_decontam_docs_per_sec": int(n_docs / fuzzy_sec),
                "mh_index_build_sec": mh_build_sec,
                "mh_index_probe_sec": mh_probe_sec,
                "mh_index_batch_dups": n_batch_dups,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
