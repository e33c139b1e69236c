#!/usr/bin/env python
"""Scale smoke for the global-order primitive (r12, VERDICT r11 #2).

10M synthetic rows (spark.range, no I/O), global ntile(4) over
(v DESC, id) computed two ways:

- ``window``: ``ntile(4).over(Window.orderBy(...))`` — the shape the
  plan audit now flags: ONE task sorts all 10M rows
  (Exchange SinglePartition);
- ``scalable``: ``with_global_row_scalable`` + ``ntile_expr`` — the
  three-pass value-bucketed rank, partition-parallel.

Asserts the two outputs are identical (quartile histogram AND a
full-row checksum), then prints one JSON line with both timings.
Numbers land in SCALE.md; the gap grows linearly with rows for the
window form and stays flat for the scalable one.

Usage: python tools/global_rank_smoke.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tower_parse_spark.operators.pack import (  # noqa: E402
    ntile_expr,
    with_global_row_scalable,
)
from tower_parse_spark.session import get_spark  # noqa: E402


def rows_df(spark, n: int):
    # v has heavy ties (1009 distinct values) so the tiebreak matters
    return spark.range(0, n, 1, 64).select(
        F.col("id"), ((F.col("id") * 7919) % 1009).cast("double").alias("v")
    )


def window_form(df):
    return df.select(
        "id",
        F.ntile(4)
        .over(W.orderBy(F.col("v").desc(), "id"))
        .alias("q"),
    )


def scalable_form(df):
    ranked = with_global_row_scalable(
        df,
        "v",
        tiebreak_col="id",
        descending=True,
        reuse="recompute",
        index_col="_r",
        total_col="_n",
    )
    return ranked.select(
        "id",
        ntile_expr(F.col("_r") + 1, F.col("_n"), 4).cast("int").alias("q"),
    )


def checksum(df):
    # order-insensitive full-row checksum + quartile histogram
    agg = df.agg(
        # pmod keeps the ANSI-mode sum well inside int64 at any n
        F.sum(F.pmod(F.xxhash64("id", "q"), F.lit(10**9))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    hist = sorted(
        (r["q"], r["n"]) for r in df.groupBy("q").count().withColumnRenamed("count", "n").collect()
    )
    return (agg["h"], agg["n"], hist)


def timed(fn, df):
    t0 = time.time()
    out = fn(df)
    cs = checksum(out)
    return round(time.time() - t0, 2), cs


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("global-rank-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    df = rows_df(spark, n).localCheckpoint(eager=True)  # same input both arms

    # warm both code paths once at 1/100 size
    small = rows_df(spark, max(n // 100, 1000)).localCheckpoint(eager=True)
    timed(window_form, small)
    timed(scalable_form, small)

    t_win, cs_win = timed(window_form, df)
    t_sca, cs_sca = timed(scalable_form, df)
    assert cs_win == cs_sca, (cs_win, cs_sca)
    print(
        json.dumps(
            {
                "n_rows": n,
                "window_sec": t_win,
                "scalable_sec": t_sca,
                "speedup": round(t_win / t_sca, 2),
                "identical": True,
                "quartile_sizes": [c for _, c in cs_win[2]],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
