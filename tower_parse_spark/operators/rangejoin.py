"""Range (interval) join — point-in-interval matching without a cross join.

The reference has no join engine at all; this is part of the §2.B join
family next to the as-of join (operators/asof.py). The naive Spark plan
for ``L.t BETWEEN R.start AND R.end`` with no equi-key is a
BroadcastNestedLoopJoin (O(|L|·|R|) comparisons) — a scale-killer. The
standard distributed strategy is **binning** (the same technique behind
Databricks' range-join optimization and interval-join engines in Flink):

- choose a bin width ``w`` (≈ the typical interval length);
- each right interval explodes into the bins it overlaps
  (``ceil(len/w)+1`` rows — bounded, linear);
- each left point lands in exactly ONE bin (``floor(t/w)``);
- equi-join on (key?, bin) — a plain shuffled/broadcast hash join —
  then filter exact containment.

Every (point, interval) match shares the point's bin by construction, so
results appear exactly once: no dedup pass needed. Shuffle volume is
|L| + Σ(interval_len)/w — tunable, partition-parallel, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with ``start <= point < end``.

    *on*: optional extra equi-key (joined alongside the bin key).
    *bin_width*: bin size in the units of the point/start/end columns —
    pick ≈ the median interval length (too small explodes the right side,
    too large degrades the post-join filter selectivity).
    *how*: 'inner' or 'left' (left rows with no containing interval kept
    with NULL right columns; implemented as inner + anti-join backfill so
    the bin explosion never produces spurious NULL-matched duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    w = float(bin_width)
    lbin = F.floor(F.col(left_point) / w)
    # interval [start, end) covers bins floor(start/w) .. floor(end'/w)
    # where end' is the last contained point; sequence is safe because
    # start <= end' by construction (empty intervals are dropped first)
    sbin = F.floor(F.col(right_start) / w).cast("long")
    ebin = F.floor((F.col(right_end) - 1e-9) / w).cast("long")
    r = right.filter(F.col(right_start) < F.col(right_end)).withColumn(
        "_bin", F.explode(F.sequence(sbin, ebin))
    )
    l_binned = left.withColumn("_bin", lbin.cast("long"))
    keys = ["_bin"] + ([on] if on else [])
    matched = (
        l_binned.join(r, keys)
        .filter(
            (F.col(right_start) <= F.col(left_point))
            & (F.col(left_point) < F.col(right_end))
        )
        .drop("_bin")
    )
    if how == "inner":
        return matched
    right_cols = [c for c in right.columns if c != on]
    missing = l_binned.drop("_bin").join(
        matched.select(*left.columns), left.columns, "left_anti"
    )
    for c in right_cols:
        missing = missing.withColumn(c, F.lit(None))
    return matched.unionByName(missing)
