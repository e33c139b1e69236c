"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no built-in as-of join (pandas-on-Spark's merge_asof exists but
pulls both sides through Python). The scalable shape used here is the
union + last-value window trick:

1. tag both sides and union them into one relation keyed by
   (key, time, tag) — right rows sort *before* left rows at equal time,
   so "at or before" includes exact matches;
2. one window pass per key ordered by (time, tag):
   ``last(right_payload) IGNORE NULLS`` carries the latest right payload
   forward onto every left row;
3. keep the left rows.

Cost: ONE shuffle on the key (the union is shuffle-free), no row
explosion, no per-key loop — at 100 TB this is a single sort-merge pass,
versus the naive inequality-join + dedup which explodes to |L|x|R| per
key before pruning. Skewed keys degrade the sort, not correctness (AQE
skew handling applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _struct_type(df: DataFrame, cols: list[str]) -> StructType:
    """The DataType of ``F.struct(*cols)`` over *df*, derived LOCALLY
    from ``df.schema``. The obvious
    ``df.select(F.struct(...)).schema`` costs a full analyzer
    round-trip to the JVM per call — three of them made asof_join's
    plan CONSTRUCTION (~0.6 s) outweigh its execution at sf0.1 (the
    r8->r9 bench flag this fixes); ``df.schema`` itself is one already-
    cached property."""
    by_name = {f.name: f for f in df.schema.fields}
    return StructType(
        [StructField(c, by_name[c].dataType, by_name[c].nullable) for c in cols]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    right_tiebreak: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: the nearest right row per key and direction.

    ``direction="backward"`` (default): latest right row with
    right_time <= left_time — the same scan, ordered descending, yields
    ``"forward"``: earliest right row with right_time >= left_time
    (pandas ``merge_asof`` parity). *tolerance* (same units as the time
    columns) nulls the payload when the matched row is further than
    that from the left row — bounded-staleness semantics.

    Returns all left columns plus *right_payload* columns (NULL when no
    right row qualifies). *right_tiebreak* makes the choice
    deterministic when several right rows share a timestamp (the
    greatest tiebreak tuple wins).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = right_payload or [
        c for c in right.columns if c not in (on, right_time)
    ]
    lrow_type = _struct_type(left, left.columns)
    rpay_type = _struct_type(right, payload)

    tiebreak = right_tiebreak or []
    tb_type = _struct_type(right, tiebreak) if tiebreak else None

    l_u = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if tiebreak else []),
    )
    r_u = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("_rpay"),
        *([F.struct(*[F.col(c) for c in tiebreak]).alias("_tb")] if tiebreak else []),
    )
    u = l_u.unionByName(r_u)
    # left rows' NULL tiebreak sorts first, but _tag already puts every
    # right row before the left rows of the same instant, so the NULLs
    # never reorder left vs right — _tb only disambiguates right-vs-right.
    # Forward direction = the identical scan over time DESCENDING: the
    # last right row seen before a left row is then the nearest future
    # one (>=, equal times still included via _tag ordering).
    t_order = (
        F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    )
    order = [t_order, F.col("_tag").asc()] + (
        [F.col("_tb").asc()] if tiebreak else []
    )
    w = (
        W.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn(
        "_rlast", F.last("_rpay", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        # carry the matched row's time alongside and null the payload
        # when it lies further than the tolerance from the left time
        carried = carried.withColumn(
            "_rt",
            F.last(
                F.when(F.col("_tag") == 0, F.col("_t")), ignorenulls=True
            ).over(w),
        )
        gap = (
            F.col("_t") - F.col("_rt")
            if direction == "backward"
            else F.col("_rt") - F.col("_t")
        )
        carried = carried.withColumn(
            "_rlast",
            F.when(gap <= F.lit(float(tolerance)), F.col("_rlast")),
        )
    carried = carried.filter(F.col("_tag") == 1)
    out_cols = [F.col("_lrow")[c].alias(c) for c in left.columns] + [
        F.col("_rlast")[c].alias(c) for c in payload
    ]
    return carried.select(*out_cols)
