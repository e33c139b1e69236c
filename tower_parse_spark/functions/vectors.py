"""Vector primitives over embedding columns (``array<float>``).

Everything is built from ``zip_with`` / ``aggregate`` higher-order
functions — JVM-side, no UDF — with a left-fold summation order identical
to the DuckDB oracle's ``list_sum(list_transform(...))`` so doubles agree
bit-for-bit in practice (results are rounded at the query edge anyway).

Scale posture: brute-force cosine top-k is a broadcast-join + per-row
array math — linear scan, embarrassingly parallel, the right baseline up
to ~10^8 vectors per query batch. The hyperplane-LSH variant cuts the
scan to one bucket per probe; see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---- SQL twins (DuckDB dialect); {a}/{b} are DOUBLE[] expressions ----------

SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({SQL_DOT.format(a=a, b=b)}) / "
        f"(({SQL_NORM.format(a=a)}) * ({SQL_NORM.format(a=b)}))"
    )


SQL_AS_DOUBLE = "list_transform({v}, x -> CAST(x AS DOUBLE))"
