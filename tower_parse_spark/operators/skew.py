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
    salt_col: str | None = None,
) -> DataFrame:
    """Join *left* and *right* on *on*, spreading each key over n_salts
    partitions. Output columns = left's ∪ right's (minus the dup key).

    Only ``inner`` and ``left`` are supported: replicating the right side
    n_salts times silently duplicates unmatched right rows under
    right/full joins and breaks semi/anti semantics.

    *salt_col*: a stable left-side column (NOT the join key — all rows of
    a hot key must spread across salts) to derive the salt from by hash,
    making the plan deterministic under task retry. Default (None) uses
    ``F.rand(seed=0)``, which is seeded per-partition: results are always
    correct (every salt value matches its replica) but a retried task may
    assign different salts, so the physical row placement isn't
    reproducible run-to-run."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full would duplicate unmatched right rows n_salts "
            "times and semi/anti semantics break under replication"
        )
    salt = (
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
        if salt_col is not None
        else (F.rand(seed=0) * n_salts).cast("int")
    )
    salted_l = left.withColumn("_salt", salt)
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")
