"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions — that is the first line of
defense and needs no code. This operator is the explicit fallback for
*extreme* hot keys (one key ≫ one executor's memory) or for engines/
versions where the AQE path doesn't apply (e.g. broadcast is impossible
because the build side is also large):

- left (fact) rows get a random salt in [0, n);
- right (dim) rows are replicated n times, one per salt value;
- the join key becomes (key, salt): the hot key's rows spread over n
  partitions instead of one.

Cost: right side ×n (choose n ~ the skew factor, not #partitions).
Correct for plain inner/left joins (each left row matches exactly its
salt's replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join *left* and *right* on *on*, spreading each key over n_salts
    partitions. Output columns = left's ∪ right's (minus the dup key)."""
    salted_l = left.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")
