"""Similarity search over embedding columns.

Two paths, per the standard ANN playbook:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  probe set against the corpus, score in-row with JVM array math, take
  top-k per probe with a window over (probe, score). Linear scan,
  perfectly parallel — the correct baseline and the verifier for any
  approximate index.
- :func:`hyperplane_lsh_topk` — random-hyperplane (sign) LSH: bucket =
  sign-bit string of dot products with H fixed hyperplanes; search only
  the probe's bucket. Recall is tunable via H (fewer planes = bigger
  buckets); multi-probe = also search buckets at Hamming distance 1.
  The hyperplanes are deterministic integer lattices (portable to the
  SQL oracle) rather than RNG Gaussians — same algorithm, seedless.

At 100 TB the corpus side stays columnar + partitioned; only (id, bucket,
vector) travels. The bucket join is an equi-join on a short string — the
shuffle the LSH exists to make cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tower_parse_spark.functions.vectors import as_double, cosine, dot

#: number of hyperplanes (sign bits) for the LSH bucket key
LSH_PLANES = 6


def hyperplane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j over R^dim: a fixed
    integer lattice ((i*31 + j*17) mod 13) - 6 — zero-mean, seedless,
    reproducible in ANSI SQL."""
    return [float((i * 31 + j * 17) % 13 - 6) for i in range(dim)]


def bucket_expr(vec_col, dim: int, planes: int = LSH_PLANES):
    """LSH bucket id = sum_j (dot(v, plane_j) >= 0) << j."""
    acc = F.lit(0).cast("long")
    for j in range(planes):
        plane = F.array(*[F.lit(x) for x in hyperplane(dim, j)])
        bit = (dot(vec_col, plane) >= 0).cast("long")
        acc = acc + F.shiftleft(bit, j)
    return acc


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k per probe (broadcast nested-loop + window)."""
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cv")
    )
    p = probes.select(
        F.col(probe_id_col), as_double(F.col(vec_col)).alias("pv")
    )
    scored = c.join(F.broadcast(p)).select(
        probe_id_col,
        id_col,
        F.round(cosine(F.col("cv"), F.col("pv")), 4).alias("cos_sim"),
    )
    w = W.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate cosine top-k: score only the probe's LSH bucket."""
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", bucket_expr(F.col("cv"), dim, planes))
    p = probes.select(
        F.col(probe_id_col), as_double(F.col(vec_col)).alias("pv")
    ).withColumn("bucket", bucket_expr(F.col("pv"), dim, planes))
    scored = c.join(F.broadcast(p), "bucket").select(
        probe_id_col,
        id_col,
        F.round(cosine(F.col("cv"), F.col("pv")), 4).alias("cos_sim"),
    )
    w = W.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
