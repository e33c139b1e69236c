"""Vector primitive parity: the single-fold multi-accumulator variants
must be BIT-IDENTICAL to the one-at-a-time folds they replace — the
property every ANN/dedup oracle hash rests on."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tower_parse_spark.functions.vectors import (
    dot,
    lit_norm,
    multi_dot_lit,
    norm,
)

DIM = 17  # deliberately odd / non-power-of-two
K = 5


def _fixture(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-5.0, 5.0) for _ in range(DIM)]) for i in range(50)
    ]
    weights = [
        [rng.uniform(-3.0, 3.0) for _ in range(DIM)] for _ in range(K)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    return df, weights


def test_multi_dot_bitwise_equals_separate_folds(spark):
    df, weights = _fixture(spark)
    multi = multi_dot_lit(F.col("v"), weights).alias("m")
    singles = F.array(
        *[
            dot(F.col("v"), F.array(*[F.lit(x) for x in w]))
            for w in weights
        ]
    ).alias("s")
    rows = df.select("id", multi, singles).collect()
    for r in rows:
        # plain == on floats IS the bitwise claim (no tolerance)
        assert list(r["m"]) == list(r["s"]), r["id"]


def test_multi_dot_self_sq_bitwise_equals_norm_fold(spark):
    df, weights = _fixture(spark)
    raw = multi_dot_lit(F.col("v"), weights, with_self_sq=True).alias("m")
    rows = df.select("id", raw, norm(F.col("v")).alias("n")).collect()
    for r in rows:
        assert float(r["m"][K]) ** 0.5 != 0  # sanity: non-degenerate
        import math

        assert math.sqrt(r["m"][K]) == r["n"], r["id"]


def test_lit_norm_bitwise_equals_runtime_fold(spark):
    _, weights = _fixture(spark)
    runtime = spark.range(1).select(
        *[
            norm(F.array(*[F.lit(x) for x in w])).alias(f"n{j}")
            for j, w in enumerate(weights)
        ]
    ).collect()[0]
    for j, w in enumerate(weights):
        assert lit_norm(w) == runtime[f"n{j}"], j


def test_multi_dot_lit_sql_text_path_bit_identical(spark):
    """r11: the SQL-text fast-construction path (one memoized F.expr
    parse) must be value-identical to the Column-built tree on real,
    NULL-element, and whole-NULL vectors, with and without the
    self-square slot — the contract ann_ivfpq/_with_centroid_scores
    now rely on."""
    from tower_parse_spark.functions.vectors import multi_dot_lit

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [0.5, -1.5, 2.5, 3.5]),
            (3, [1.0, None, 3.0, 4.0]),
            (4, None),
        ],
        "id long, v array<double>",
    )
    W = [[1.0, 0.25, -2.0, 3.0], [0.1, 0.2, 0.3, 0.4], [7.0, 0.0, -1.0, 2.0]]
    for self_sq in (False, True):
        col_form = df.select(
            "id", multi_dot_lit(F.col("v"), W, with_self_sq=self_sq).alias("r")
        ).collect()
        sql_form = df.select(
            "id", multi_dot_lit("v", W, with_self_sq=self_sq).alias("r")
        ).collect()
        assert [(r.id, r.r) for r in col_form] == [
            (r.id, r.r) for r in sql_form
        ], self_sq
    # sliced sub-vector form (the _subspace_dots call shape)
    a = df.select(
        multi_dot_lit(F.slice(F.col("v"), 2, 2), [[1.5, -2.5]]).alias("r")
    ).collect()
    b = df.select(
        multi_dot_lit("slice(`v`, 2, 2)", [[1.5, -2.5]]).alias("r")
    ).collect()
    assert [r.r for r in a] == [r.r for r in b]
    # memoization: same (sql, weights) returns the same Column object
    assert multi_dot_lit("v", W) is multi_dot_lit("v", W)
