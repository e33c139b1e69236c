"""Deterministic sampling and dataset splitting for training pipelines.

Train/validation/test assignment at 100 TB must be a pure function of
the row, never of the partitioning: ``df.sample()``/``rand()`` change
under retries, repartitioning, and re-runs, which silently leaks
validation rows into training between pipeline versions. The standard
fix (public practice in every large corpus pipeline) is hash-bucketing:

    bucket(id) = md5(salt || id) mod B            -- stable, uniform
    split     = first interval of cumulative weights containing bucket

Everything here is a row-local JVM expression (md5 + conv + pmod) — no
shuffle, no UDF, no driver involvement — and md5 makes it bit-identical
in the DuckDB oracle, in any other engine, and across Spark versions
(engine-native hash seeds differ; md5 does not).

The same bucket column drives per-stratum downsampling ("domain
mixing"): keep a row iff bucket < rate(stratum) * B — deterministic,
join-free, and exactly reproducible for audits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space; 10_000 gives 0.01% rate resolution while keeping the
#: md5-prefix -> bigint conversion exact (15 hex chars < 2^60).
N_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Uniform deterministic bucket in [0, N_BUCKETS): first 15 hex chars
    of md5(salt || '|' || key) as bigint, mod N_BUCKETS.

    Twin: CAST('0x' || substr(md5('salt|' || key), 1, 15) AS BIGINT)
    % N_BUCKETS. The salt decorrelates independent sampling decisions
    made on the same key (split vs downsample vs sharding).

    NULL keys bucket to NULL on BOTH engines: the hash input is built
    with ``concat`` (null-propagating, matching SQL ``||``), NOT
    ``concat_ws`` (null-skipping) — concat_ws would silently collapse
    every NULL key into the single md5(salt) bucket on the Spark side
    while the twin yields NULL, breaking the bit-identical contract and
    deterministically dumping all NULL-id rows into the first split.
    For non-NULL keys the bytes are identical either way.
    """
    h = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % N_BUCKETS


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Append ``split``: deterministic assignment by cumulative weight
    intervals over the hash bucket. Weights must sum to 1 (±1e-9);
    interval edges are exact integers so assignment is engine-portable.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cut = int(round(edge * N_BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def stratified_downsample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum downsampling ("domain mixing").

    Keeps a row iff its (salted) hash bucket falls below
    ``rate(stratum) * N_BUCKETS`` — an exact, reproducible Bernoulli
    sample per domain with zero shuffles (pure filter; at scale it
    rides the parquet scan). Unknown strata use *default_rate*.
    """
    bucket = hash_bucket(F.col(id_col), salt)
    rate = None
    for name, r in sorted(rates.items()):
        cut = F.lit(int(round(r * N_BUCKETS)))
        cond = F.col(stratum_col) == name
        rate = F.when(cond, cut) if rate is None else rate.when(cond, cut)
    cut_default = F.lit(int(round(default_rate * N_BUCKETS)))
    rate = cut_default if rate is None else rate.otherwise(cut_default)
    return df.filter(bucket < rate)


def sql_hash_bucket(key_expr: str, salt: str = "split") -> str:
    """DuckDB twin of :func:`hash_bucket` (key cast to VARCHAR first)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || '|' || CAST({key_expr} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {N_BUCKETS}"
    )


# --------------------------------------------------------------------------
# Temperature-based domain reweighting
# --------------------------------------------------------------------------

#: weight quantization scale: sqrt(share) is quantized to an integer
#: BEFORE the normalizing sum so the sum is associative (exact under any
#: partial-aggregation order — the quantized-integer-sum pattern of
#: queries/llm.py::quality_filter_funnel) and the DuckDB oracle matches
#: bit-for-bit.
WEIGHT_SCALE = 1_000_000_000


def temperature_weights(
    df: DataFrame,
    stratum_col: str = "source",
    size_col: str = "n_tokens",
    alpha: float = 0.5,
) -> DataFrame:
    """Static domain-mixture reweighting by temperature sampling
    (public methodology: the alpha-smoothed sampling of multilingual
    BERT / XLM-R, the static mixture-weight shape DoReMi optimizes):
    target weight_s proportional to share_s^alpha, realized as a
    DOWNSAMPLING rate per domain (rate <= 1 everywhere, rate = 1 for the
    most-upweighted domain) suitable for
    :func:`stratified_downsample`.

    Input: one row per stratum with a size column (token counts).
    Output adds ``share`` (raw corpus fraction), ``weight`` (normalized
    target fraction) and ``sampling_rate``.

    Scale shape: the input relation is the OUTPUT of a per-domain
    aggregate, i.e. |domains| rows, orders of magnitude smaller than the
    corpus. The two global reductions (total size; normalizer + max
    rate) are one-row aggregates broadcast back via nested-loop joins of
    a single row each — the allowlisted one-row-broadcast pattern
    (queries/llm.py tf-idf N) — so there is never a single-partition
    window over all domains.

    Only alpha = 0.5 is cross-engine exact (sqrt is IEEE-correctly
    rounded in both engines; pow is not): other alphas are accepted but
    the oracle-checked registry query pins 0.5.
    """
    if alpha != 0.5:
        raise ValueError("temperature_weights: only alpha=0.5 is oracle-exact")
    # the per-domain input feeds TWO consumers (the total and the join)
    # and j1 feeds two more — materialize both tiny relations so the
    # upstream corpus scan + aggregate runs ONCE, not once per consumer
    # (the checkpoint-before-fan-out rule, cf. operators/dedup.py's
    # passage relation)
    df = df.localCheckpoint(eager=True)
    tot = df.agg(F.sum(size_col).alias("_tot"))
    # zero-size domains (and an all-empty corpus) get share/weight/rate
    # 0.0 instead of an ANSI divide-by-zero; every division below is
    # CASE-guarded identically in the SQL oracle twin
    share = F.when(
        F.col("_tot") > 0, F.col(size_col) / F.col("_tot")
    ).otherwise(F.lit(0.0))
    j1 = (
        df.crossJoin(F.broadcast(tot))
        .withColumn("_share", share)
        .withColumn(
            "_wq", F.floor(F.sqrt(F.col("_share")) * WEIGHT_SCALE + F.lit(0.5))
        )
        .withColumn(
            "_rate_raw",
            F.when(
                F.col("_share") > 0,
                (F.col("_wq") / F.lit(float(WEIGHT_SCALE))) / F.col("_share"),
            ).otherwise(F.lit(0.0)),
        )
    )
    j1 = j1.localCheckpoint(eager=True)
    g = j1.agg(
        F.sum("_wq").alias("_wsum"), F.max("_rate_raw").alias("_rmax")
    )
    return (
        j1.crossJoin(F.broadcast(g))
        .withColumn("share", F.col("_share"))
        .withColumn(
            "weight",
            F.when(F.col("_wsum") > 0, F.col("_wq") / F.col("_wsum")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "sampling_rate",
            F.when(
                F.col("_rmax") > 0, F.col("_rate_raw") / F.col("_rmax")
            ).otherwise(F.lit(0.0)),
        )
        .drop("_tot", "_share", "_wq", "_rate_raw", "_wsum", "_rmax")
    )
