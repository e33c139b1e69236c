"""Cross-engine deterministic rounding.

``round()`` is NOT portable between Spark and DuckDB: Spark rounds the
shortest decimal representation of the double (BigDecimal HALF_UP on
``Double.toString``), DuckDB rounds the true binary value — any result
whose shortest repr terminates with a 5 right after the kept digits
diverges (common for ratio arithmetic: hits/n_tokens etc.).

``pround`` instead composes primitive double ops — ``floor(x * 10^n + 0.5)
/ 10^n`` — that both engines evaluate identically on the same input bits,
so parity holds for every value, not just generic ones. (Half-values round
toward +inf in both engines — a convention choice, applied consistently.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, digits: int) -> Column:
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_pround(expr: str, digits: int) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
