"""embedding_cluster_stats semantics: partition completeness and purity
bounds. Value-level parity is pinned by the DuckDB oracle."""

from __future__ import annotations

from tower_parse_spark.queries.llm import embedding_cluster_stats
from tower_parse_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_cluster_stats_partition_and_purity(spark):
    emb_n = load_table(spark, SF, "embeddings").count()
    rows = embedding_cluster_stats(spark, SF).collect()
    # every vector lands in exactly one cell (assignment is total — the
    # non-nullable coalesce guarantees even malformed rows get a cell)
    assert sum(r["n_vecs"] for r in rows) == emb_n
    for r in rows:
        assert 1 <= r["cell"] <= 8
        assert 0 < r["top_label_frac"] <= 1.0
        assert r["avg_norm"] > 0
        assert 0 <= r["top_label"] <= 9
    # cells are distinct and sorted
    cells = [r["cell"] for r in rows]
    assert cells == sorted(set(cells))
