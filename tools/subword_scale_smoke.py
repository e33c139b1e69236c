#!/usr/bin/env python
"""Subword fold cost curve vs vocabulary size (r9 VERDICT #4 evidence).

Times the greedy longest-match fold ITSELF over a generated
50k-distinct-word relation (16-hex-char words from md5 — deterministic,
no corpus dependence; the real pipeline's distinct-word dedup already
bounds fold evaluations, so the isolated fold cost is exactly what the
vocabulary-size claim is about). The piece vocabulary is the first N
hex strings interleaved across lengths 4/3/2, so probes genuinely hit
mid-word.

``--legacy`` times the pre-r9 fold (O(|vocab|) ``F.filter`` scan per
position, re-slicing the word once per piece) for contrast with the
r9 length-descending map probes. The legacy body lives ONLY here, as
the measurement baseline. ``--join`` times the relational hash-join
path (``subword_counts_relational`` — the 32k-vocab plan whose
per-probe cost is independent of |vocab|).

``--trained`` times the r9 map-probe fold (and the join path) on a
vocabulary actually LEARNED by ``bpe_train_merges`` (1000 merge
rounds over 5k of the same words) instead of the synthetic hex
pieces — trained pieces skew short, so this exercises the realistic
per-length map-size distribution the synthetic ladder can't.

Usage: python tools/subword_scale_smoke.py [--legacy|--join|--trained]
[n_words] [size ...]. Extra positional ints override the default
sizes ladder (r10: ``--join 50000 32000`` pins the stated 32k design
point). Prints one JSON line: {"impl": ..., "n_words": N,
"sizes": [...], "sec": [...]}  (best of 3 per size; --trained adds
"piece_len_hist"; --join adds the broadcast piece-table rows/bytes
per size).
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SIZES = (51, 250, 1000, 4000)
HEX = "0123456789abcdef"


def _legacy_subword_count(word: Column, vocab: tuple[str, ...]) -> Column:
    """The pre-r9 fold, verbatim shape: filter-scan the full piece
    array at every position."""
    from tower_parse_spark.operators.subword import _pieces_desc

    pieces = F.array(*[F.lit(p) for p in _pieces_desc(vocab)])
    word = F.coalesce(word, F.lit(""))
    init = F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt"))

    def step(st: Column, _i: Column) -> Column:
        pos, cnt = st["pos"], st["cnt"]
        matched = F.filter(
            pieces, lambda p: F.substring(word, pos, F.length(p)) == p
        )
        plen = F.when(
            F.size(matched) > 0, F.length(F.element_at(matched, 1))
        ).otherwise(F.lit(1))
        return F.when(pos > F.length(word), st).otherwise(
            F.struct((pos + plen).alias("pos"), (cnt + 1).alias("cnt"))
        )

    steps = F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1)))
    return F.aggregate(steps, init, step, lambda st: st["cnt"])


def _hex_vocab(size: int) -> tuple[str, ...]:
    """First *size* hex pieces, interleaved across lengths 4/3/2 so the
    probe ladder keeps multiple lengths at every size."""
    by_len = {
        L: ["".join(t) for t in itertools.product(HEX, repeat=L)]
        for L in (2, 3, 4)
    }
    out: list[str] = []
    i = 0
    while len(out) < size:
        for L in (4, 3, 2):
            if i < len(by_len[L]) and len(out) < size:
                out.append(by_len[L][i])
        i += 1
    return tuple(sorted(set(out)))


def main() -> int:
    legacy = "--legacy" in sys.argv
    join = "--join" in sys.argv
    trained = "--trained" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_words = int(args[0]) if args else 50_000

    from tower_parse_spark import session as S
    from tower_parse_spark.operators import subword as SW

    spark = S.get_spark()
    words = (
        spark.range(n_words)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")), 1, 16
            ).alias("_tok")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    counter = _legacy_subword_count if legacy else SW.subword_count

    def run(vocab: tuple[str, ...]) -> float:
        if join:
            counted = SW.subword_counts_relational(words, vocab).select(
                F.col("n_sub").alias("_n")
            )
        else:
            counted = words.select(counter(F.col("_tok"), vocab).alias("_n"))
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            counted.agg(F.sum("_n")).collect()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    if trained:
        # learn a real merge table from a slice of the same words, then
        # time counting over the FULL word relation with it
        t0 = time.monotonic()
        merges = SW.bpe_train_merges(
            words.limit(5000).select(
                F.col("_tok").alias("word"), F.lit(1).alias("count")
            ),
            1000,
        )
        train_sec = round(time.monotonic() - t0, 1)
        vocab = SW.merges_to_vocab(merges)
        hist: dict[int, int] = {}
        for p in vocab:
            hist[len(p)] = hist.get(len(p), 0) + 1
        print(
            json.dumps(
                {
                    "impl": "map-probe-trained"
                    if not join
                    else "relational-join-trained",
                    "n_words": n_words,
                    "sizes": [len(vocab)],
                    "sec": [run(vocab)],
                    "train_sec": train_sec,
                    "piece_len_hist": {
                        str(k): hist[k] for k in sorted(hist)
                    },
                }
            )
        )
        return 0

    ladder = tuple(int(a) for a in args[1:]) or SIZES
    sizes, secs, tables = [], [], []
    for size in ladder:
        vocab = SW.SUBWORD_VOCAB if size == 51 else _hex_vocab(size)
        sizes.append(len(vocab))
        secs.append(run(vocab))
        multi = [p for p in vocab if len(p) > 1]
        tables.append(
            {
                "rows": len(multi),
                # (piece, plen int) row payload estimate: string bytes +
                # 4-byte int + ~16 bytes row overhead
                "bytes_est": sum(len(p) + 20 for p in multi),
            }
        )
    out = {
        "impl": (
            "legacy-filter-scan"
            if legacy
            else ("relational-join" if join else "map-probe")
        ),
        "n_words": n_words,
        "sizes": sizes,
        "sec": secs,
    }
    if join:
        out["piece_table"] = tables
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
