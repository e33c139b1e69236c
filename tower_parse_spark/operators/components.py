"""Connected components over a pair list — duplicate-cluster resolution.

The last stage of every near-dedup pipeline: candidate pairs (MinHash,
SimHash bands, cosine blocks) form a graph; each connected component is
one duplicate cluster; the survivor is the minimum id. Implemented as
iterative min-label propagation on DataFrames:

    label(v) <- min(label(v), min over neighbors(label(u)))

followed by pointer-jumping path compression each round:

    label(v) <- label(label(v))

so label chains halve every iteration and convergence is O(log diameter)
rounds, not O(diameter) — the property that makes pathological duplicate
chains (heavily templated corpora) safe at 100 TB (the same doubling
trick as the published large-star/small-star MapReduce algorithm,
Kiveris et al. 2014). Each round is two shuffles (neighbor-min groupBy +
compression self-join on the small labels relation). ``localCheckpoint``
truncates the lineage so the plan doesn't grow exponentially with
iterations — the standard Spark iterative-algorithm pattern
(GraphX/GraphFrames do the same internally).

At 100 TB the pair list is orders of magnitude smaller than the corpus
(only same-bucket collisions), so the propagation runs on the small edge
relation; the final survivor join back to documents is one broadcast or
hash join keyed by component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve components of the undirected pair graph.

    Returns (node, component) where component = min node id reachable.
    Isolated nodes don't appear (callers union non-candidates back in).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    *max_iter* rounds (a chain longer than max_iter hops would otherwise
    silently split one cluster into several) — raise *max_iter* for
    pathologically deep graphs.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    # Fused round 0: with identity initial labels, the first propagation
    # min(label(v), min neighbors(label(u))) is just min(v, min(u)) — one
    # aggregation over the edge list, no join.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nb"))
        .select("node", F.least(F.col("node"), F.col("nb")).alias("label"))
        .localCheckpoint(eager=True)
    )
    # Convergence witness: labels are node ids and only ever DECREASE
    # (least/min over neighbors), so sum(label) strictly decreases while
    # any label changes and is a fixpoint certificate when it stalls.
    # One tiny agg job per round instead of a join+filter+count. Seeded
    # from the fused round-0 labels: a graph already converged at init
    # (every duplicate CLIQUE is) exits after a single confirmation round.
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]
    converged = False
    for it in range(max_iter):
        # label(v) <- min(label(v), min over neighbors(label(u))) as ONE
        # aggregation: neighbor contributions unioned with the node's own
        # label, then groupBy-min — one join + one shuffle per round
        # (the separate neighbor-min groupBy + left-join-back shape costs
        # a second join for the same result).
        contrib = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), "label"
        )
        propagated = (
            labels.unionAll(contrib)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Path compression: follow the label pointer one hop
        # (label(v) <- label(label(v))), halving chain lengths each round.
        # Every label value is itself a node (labels are node ids and the
        # edge set is symmetric), so the left join only misses when the
        # pointer is already a root — coalesce keeps it.
        # Skipped for the first two rounds: typical duplicate clusters
        # converge by then, and the extra self-join would only add cost;
        # deep chains (the pathological case) still get O(log d) from
        # round 3 on.
        if it >= 2:
            parents = propagated.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            propagated = (
                propagated.join(
                    parents, propagated.label == parents.p_node, "left"
                )
                .select(
                    "node",
                    F.coalesce(F.col("p_label"), F.col("label")).alias(
                        "label"
                    ),
                )
            )
        new_labels = propagated.localCheckpoint(eager=True)
        # decimal accumulator: a long sum of 64-bit ids overflows (ANSI
        # error) at billions of nodes; decimal(38,0) holds ~1e38
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations; components would be split — raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster near-dup pairs and pick survivors.

    Returns every document with its cluster id (its own id when unique)
    and an ``is_survivor`` flag (minimum id in the cluster survives —
    deterministic, same rule as exact_dedup)."""
    comp = connected_components(pairs)
    out = docs.join(
        comp, docs[id_col] == comp.node, "left"
    ).select(
        docs[id_col],
        F.coalesce(F.col("component"), docs[id_col]).alias("cluster_id"),
    )
    return out.withColumn(
        "is_survivor", (F.col(id_col) == F.col("cluster_id"))
    )
