"""Semantic deduplication over an embedding column (SemDeDup-style).

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public methodology): cluster the
embeddings with k-means, then within each cluster drop members whose
cosine similarity to another member exceeds a threshold, keeping one
representative per near-duplicate group. Pairwise work is bounded by
cluster size — never corpus-pairwise.

Engine mapping:

- the cluster assignment is the IVF coarse quantizer
  (operators/similarity.py — ``kmeans_centroids`` for trained
  deployments, the deterministic lattice for the oracle-checked query);
- the representative rule keeps the CENTROID-NEAREST member of each
  similar pair (tie-break: lower id) — greedy pairwise like the LSH
  dedup family, not transitive closure: in a chain a~b~c each member
  drops if ANY similar neighbor beats it, so the locally-best survive
  deterministically;
- candidate pairs are additionally blocked on the sign-LSH bucket
  INSIDE the cell (``bucket_expr``): near-duplicates at cos >= 0.9
  almost always share all hyperplane signs, and the extra key divides
  the per-cell quadratic by ~2^planes — the same recall trade the
  embedding-cosine dedup family documents (a perturbation that flips a
  sign bit is missed by engine and oracle identically).

Scale shape at 100 TB: one scoring projection (single staged fold per
row), one equi-join on the non-nullable (cell, bucket) key carrying
(id, vector, norm) only, one small count aggregate, one join back.
Cluster count is the knob that bounds per-cell pair counts — train
k ≈ n / target_cell_size with kmeans_centroids; the quadratic is per
cell and never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tower_parse_spark.functions.vectors import as_double, dot
from tower_parse_spark.operators.similarity import (
    IVF_K,
    _with_centroid_scores,
    bucket_expr,
    lattice_centroids,
)


def semantic_dedup_flags(
    df: DataFrame,
    dim: int,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector semantic-dedup verdicts: ``(id, cell, cent_cos,
    n_better, is_semdup, keep)`` where ``is_semdup`` means some
    same-cell, same-bucket vector with cosine >= *threshold* ranks
    closer to the centroid (4-dp-rounded comparison, so the decision is
    bit-identical on the DuckDB twin; ties break toward the lower id).

    Malformed vectors (NULL / empty / zero-norm) land in deterministic
    cell 0 with a NULL ``cent_cos`` and are EXCLUDED from the pair legs
    (the banded_signatures empty-doc rule: at web scale a shared
    degenerate block key is a quadratic blowup of junk pairs whose
    scores would all be NULL anyway); they come back in the output with
    ``keep = true`` — malformedness is a quality-filter concern, not a
    duplicate signal.

    The staged relation (vector, norm, cell, bucket, cent_cos) feeds
    three consumers (two join legs + the verdict join-back), so it is
    localCheckpointed — the scoring fold runs once per row (the
    embedding_near_dup_pairs fan-out rule).
    """
    from tower_parse_spark.session import ensure_parallelism

    cents = (
        centroids if centroids is not None else lattice_centroids(dim, IVF_K)
    )
    # the k-centroid scoring fold is compute-bound per row; a small
    # parquet corpus arrives as ONE split (r10 classifier precedent —
    # no-op at real scale)
    df = ensure_parallelism(df)
    base = (
        _with_centroid_scores(
            df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
            "v",
            cents,
            out="_sc",
            out_norm="nv",
        )
        .select(
            F.col(id_col),
            "v",
            "nv",
            F.coalesce(
                F.array_position(F.col("_sc"), F.array_max(F.col("_sc"))),
                F.lit(0).cast("long"),
            ).alias("cell"),
            F.round(F.array_max(F.col("_sc")), 4).alias("cent_cos"),
            bucket_expr(F.col("v"), dim).alias("blk"),
        )
        .localCheckpoint(eager=False)
    )
    a = base.filter(F.col("nv") > 0).select(
        F.col(id_col).alias("_aid"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "cell",
        "blk",
        F.col("cent_cos").alias("ca"),
    )
    b = base.filter(F.col("nv") > 0).select(
        F.col(id_col).alias("_bid"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "cell",
        "blk",
        F.col("cent_cos").alias("cb"),
    )
    beats = (F.col("ca") > F.col("cb")) | (
        (F.col("ca") == F.col("cb")) & (F.col("_aid") < F.col("_bid"))
    )
    cos = F.round(
        F.try_divide(
            dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
        ),
        4,
    )
    better = (
        a.join(b, ["cell", "blk"])
        .filter((F.col("_aid") != F.col("_bid")) & beats)
        .filter(cos >= threshold)
        .groupBy("_bid")
        .agg(F.count(F.lit(1)).alias("n_better"))
        .withColumnRenamed("_bid", id_col)
    )
    n = F.coalesce(F.col("n_better"), F.lit(0).cast("long"))
    return (
        base.select(id_col, "cell", "cent_cos")
        .join(better, id_col, "left")
        .select(
            F.col(id_col),
            "cell",
            "cent_cos",
            n.alias("n_better"),
            (n > 0).alias("is_semdup"),
            (n == 0).alias("keep"),
        )
    )
