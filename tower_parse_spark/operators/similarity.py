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

from tower_parse_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    lit_norm,
    multi_dot_lit,
    norm,
)

#: number of hyperplanes (sign bits) for the LSH bucket key
LSH_PLANES = 6

#: IVF coarse-quantizer cells and probe fan-out
IVF_K = 8
IVF_NPROBE = 2


def hyperplane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j over R^dim: a fixed
    integer lattice ((i*31 + j*17) mod 13) - 6 — zero-mean, seedless,
    reproducible in ANSI SQL."""
    return [float((i * 31 + j * 17) % 13 - 6) for i in range(dim)]


def bucket_expr(vec_col, dim: int, planes: int = LSH_PLANES):
    """LSH bucket id = sum_j (dot(v, plane_j) >= 0) << j.

    All *planes* dots ride ONE array traversal (multi_dot_lit — the
    simhash single-fold pattern), and the fold result is referenced
    exactly once: the sign/weight mapping and the bit-sum are a
    zip_with + fold over the k-wide dot array, so the expensive
    traversal is never re-inlined. Each dot is bit-identical to the
    separate-fold form, so bucket ids (and the DuckDB oracle's) are
    unchanged."""
    dots = multi_dot_lit(vec_col, [hyperplane(dim, j) for j in range(planes)])
    powers = F.array(
        *[F.lit(1 << j).cast("long") for j in range(planes)]
    )
    bits = F.zip_with(
        dots,
        powers,
        lambda d, w: F.when(d >= 0, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc + b
    )


def centroid(dim: int, j: int) -> list[float]:
    """Deterministic IVF centroid j: a fixed integer lattice decorrelated
    from the LSH hyperplanes ((i*37 + j*29) mod 15 - 7). The lattice
    keeps the oracle-checked query seedless and SQL-reproducible; it is
    also the k-means init (:func:`kmeans_centroids`) for deployments
    that train the quantizer."""
    return [float((i * 37 + j * 29) % 15 - 7) for i in range(dim)]


def lattice_centroids(dim: int, k: int = IVF_K) -> list[list[float]]:
    return [centroid(dim, j) for j in range(k)]


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    k: int = IVF_K,
    iters: int = 5,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train the IVF coarse quantizer: Lloyd's k-means on the DataFrame.

    Spherical variant (cosine assignment, arithmetic-mean update) — the
    metric :func:`ivf_topk` searches with. Each iteration is ONE
    distributed pass: assign cell = argmax cosine against the current
    centroids (plan literals), then a k-row aggregate of per-component
    means. The driver only ever holds k x dim floats (same posture as
    pack offsets); the vectors never leave the executors. Deterministic:
    lattice init, no RNG. Empty cells reseed from the worst-covered
    vectors (lowest best-cosine) — the standard Lloyd fix that lets a
    dead cell capture an unclaimed cluster."""
    vecs = df.select(as_double(F.col(vec_col)).alias("v"))
    cents = lattice_centroids(dim, k)
    for _ in range(iters):
        assigned = _with_centroid_scores(vecs, "v", cents).select(
            "v",
            F.array_position(F.col("sc"), F.array_max(F.col("sc"))).alias(
                "cell"
            ),
            F.array_max(F.col("sc")).alias("best"),
        )
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        new = [list(c) for c in cents]
        filled = set()
        for r in means:
            new[r["cell"] - 1] = [float(r[f"m{i}"]) for i in range(dim)]
            filled.add(r["cell"] - 1)
        empty = [j for j in range(k) if j not in filled]
        if empty:
            # reseed each dead cell with a distinct worst-covered vector
            worst = (
                assigned.orderBy(F.col("best").asc())
                .limit(len(empty))
                .collect()
            )
            for j, r in zip(empty, worst):
                new[j] = [float(x) for x in r["v"]]
        cents = new
    return cents


def _centroid_cos_scores(vec_col, centroids: list[list[float]]):
    """Array of cosine similarities to each centroid (plan literals).

    Expression form: k separate cosine folds. Fine for single-reference
    expression contexts (ivf_cells); DataFrame pipelines should prefer
    :func:`_with_centroid_scores`, which computes all k dots + the
    vector norm in ONE staged traversal."""
    scores = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        scores.append(cosine(vec_col, carr))
    return F.array(*scores)


def _with_centroid_scores(
    df: DataFrame,
    vec_colname: str,
    centroids: list[list[float]],
    out: str = "sc",
    out_norm: str | None = None,
):
    """Stage the k-cosine score array as column *out* from ONE array
    traversal: a (k+1)-accumulator fold (k dots + the self-square, the
    simhash single-fold pattern) staged as its own column, with the k
    scores derived from cheap slot reads. Replaces 2k interpreted
    traversals per row (k dot folds + k vector-norm folds) with one.
    *out_norm* optionally also materializes the vector norm from the
    same fold. Values are bit-identical to the cosine() form: each
    accumulator keeps the 0.0-seeded index-ascending summation, the
    constant centroid norms fold driver-side (lit_norm), and the
    division keeps the d / (vnorm * cnorm) grouping."""
    k = len(centroids)
    df = df.withColumn(
        "_scraw",
        multi_dot_lit(F.col(vec_colname), centroids, with_self_sq=True),
    )
    vnorm = F.sqrt(F.col("_scraw")[k])
    scores = F.array(
        *[
            F.col("_scraw")[j] / (vnorm * F.lit(lit_norm(centroids[j])))
            for j in range(k)
        ]
    )
    df = df.withColumn(out, scores)
    if out_norm is not None:
        df = df.withColumn(out_norm, vnorm)
    return df.drop("_scraw")


def ivf_cells(
    vec_col,
    dim: int,
    nprobe: int,
    k: int = IVF_K,
    centroids: list[list[float]] | None = None,
):
    """The *nprobe* nearest centroid ids (1-based), best first.

    argmax via array_position(scores, array_max(scores)) — first maximum
    wins, a deterministic tie-break both engines share. Subsequent probes
    mask the already-chosen cell and repeat.
    """
    scores = _centroid_cos_scores(
        vec_col, centroids if centroids is not None else lattice_centroids(dim, k)
    )
    cells = []
    masked = scores
    for _ in range(nprobe):
        best = F.array_position(masked, F.array_max(masked))
        cells.append(best)
        prev = masked
        masked = F.transform(
            prev,
            lambda x, i: F.when(i + 1 == best, F.lit(-9.0)).otherwise(x),
        )
    return cells


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are assigned to their
    nearest coarse-quantizer cell (inverted list); each probe scans only
    its *nprobe* nearest cells. The cell join is an equi-join on a small
    int — at 10^9+ vectors the inverted lists are the partition key and
    only probed cells are read (partition pruning on cell id).

    *centroids*: pass :func:`kmeans_centroids` output for a trained
    quantizer; default is the seedless lattice (oracle-reproducible).

    The k-cosine score array and each masking level are STAGED as named
    columns (the round-1 lesson: an expression referenced N times is
    inlined N times by Catalyst — the nprobe masked-argmax embeds the
    score array recursively, so unstaged trees grow combinatorially in
    nprobe). Identical arithmetic, identical values."""
    cents = centroids if centroids is not None else lattice_centroids(dim, IVF_K)
    c = (
        _with_centroid_scores(
            corpus.select(
                F.col(id_col), as_double(F.col(vec_col)).alias("cv")
            ),
            "cv",
            cents,
            out_norm="cn",
        )
        .withColumn(
            "cell", F.array_position(F.col("sc"), F.array_max(F.col("sc")))
        )
        .drop("sc")
    )
    p = _with_centroid_scores(
        probes.select(
            F.col(probe_id_col), as_double(F.col(vec_col)).alias("pv")
        ),
        "pv",
        cents,
        out="sc0",
        out_norm="pn",
    )
    cell_cols = []
    for lvl in range(nprobe):
        best = F.array_position(
            F.col(f"sc{lvl}"), F.array_max(F.col(f"sc{lvl}"))
        )
        p = p.withColumn(f"cell{lvl}", best)
        if lvl + 1 < nprobe:

            def _mask(chosen):
                return lambda x, i: F.when(
                    i + 1 == chosen, F.lit(-9.0)
                ).otherwise(x)

            p = p.withColumn(
                f"sc{lvl + 1}",
                F.transform(F.col(f"sc{lvl}"), _mask(F.col(f"cell{lvl}"))),
            )
        cell_cols.append(F.col(f"cell{lvl}"))
    p = (
        p.withColumn("cell", F.explode(F.array(*cell_cols)))
        .drop(*[f"sc{i}" for i in range(nprobe)])
        .drop(*[f"cell{i}" for i in range(nprobe)])
    )
    scored = c.join(F.broadcast(p), "cell").select(
        probe_id_col,
        id_col,
        F.round(
            dot(F.col("cv"), F.col("pv")) / (F.col("cn") * F.col("pn")), 4
        ).alias("cos_sim"),
    )
    w = W.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k per probe (broadcast nested-loop + window).

    Norms are projected per ROW before the join: scoring a pair is then
    one dot-product fold + two scalar reads, not three array traversals
    — the same fold per row gives bit-identical values to an inline
    cosine(), but the O(pairs) stage stops re-deriving O(rows) work.
    """
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(probe_id_col), as_double(F.col(vec_col)).alias("pv")
    ).withColumn("pn", norm(F.col("pv")))
    scored = c.join(F.broadcast(p)).select(
        probe_id_col,
        id_col,
        F.round(
            dot(F.col("cv"), F.col("pv")) / (F.col("cn") * F.col("pn")), 4
        ).alias("cos_sim"),
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
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: score only the probe's LSH bucket.
    Norms projected per row pre-join (see brute_force_topk).

    *multiprobe*: additionally search every bucket at Hamming distance 1
    from the probe's (flip each sign bit) — the standard recall knob for
    near-boundary neighbors. The probe side (tiny, broadcast) explodes
    1+planes ways; the corpus side is untouched, so the join stays a
    bucket equi-join with (planes+1)x the probe rows, NOT a wider scan.
    """
    c = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("cv"))
        .withColumn("bucket", bucket_expr(F.col("cv"), dim, planes))
        .withColumn("cn", norm(F.col("cv")))
    )
    p = (
        probes.select(
            F.col(probe_id_col), as_double(F.col(vec_col)).alias("pv")
        )
        .withColumn("bucket", bucket_expr(F.col("pv"), dim, planes))
        .withColumn("pn", norm(F.col("pv")))
    )
    if multiprobe:
        neighbors = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("long"))
                for j in range(planes)
            ],
        )
        p = p.withColumn("bucket", F.explode(neighbors))
    scored = c.join(F.broadcast(p), "bucket").select(
        probe_id_col,
        id_col,
        F.round(
            dot(F.col("cv"), F.col("pv")) / (F.col("cn") * F.col("pn")), 4
        ).alias("cos_sim"),
    )
    w = W.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
