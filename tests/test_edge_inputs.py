"""Degenerate-input robustness for the round-5 operators: empty tables,
single-row corpora, NULL vectors. The driver regenerates fixtures
between rounds (and has changed shapes before), so zero-row and
malformed inputs must degrade to empty/deterministic results, never
crash."""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.operators import dedup as D
from tower_parse_spark.operators import pq as PQ
from tower_parse_spark.operators import similarity as S


def _empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_ivfpq_empty_and_single_row(spark):
    empty = _empty_emb(spark)
    probes = empty.select(F.col("vec_id").alias("probe_id"), "embedding")
    assert PQ.ivfpq_topk(empty, probes, dim=64, k=5).count() == 0
    one = spark.createDataFrame(
        [(1, [0.1] * 64, 0)], "vec_id long, embedding array<double>, label int"
    )
    op = one.select(F.col("vec_id").alias("probe_id"), "embedding")
    assert PQ.ivfpq_topk(one, op, dim=64, k=5).count() == 1
    assert PQ.ivfpq_topk(one, op, dim=64, k=5, rerank=5).count() == 1


def test_dedup_operators_empty_inputs(spark):
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert D.source_minhash_overlap(empty_docs).count() == 0
    assert D.embedding_near_dup_pairs(_empty_emb(spark), dim=64).count() == 0
    # empty HISTORY: the whole batch survives
    batch = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    empty_hist = spark.createDataFrame([], "text_hash string")
    assert D.incremental_exact_dedup(batch, empty_hist).count() == 1


def test_seqpack_and_fuzzy_decontam_empty_inputs(spark):
    from tower_parse_spark.operators.decontam import flag_contaminated_fuzzy
    from tower_parse_spark.operators.seqpack import pack_sequences

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty_docs).count() == 0
    one = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    row = pack_sequences(one, seq_tokens=4, shards=2).first()
    assert (row.start_off, row.first_seq, row.n_seqs) == (0, 0, 1)
    # empty benchmark: nothing flagged, every corpus id still reported
    out = flag_contaminated_fuzzy(one, empty_docs).collect()
    assert len(out) == 1 and not out[0].contaminated
    # empty corpus: empty result, not a crash
    assert flag_contaminated_fuzzy(empty_docs, one).count() == 0


def test_null_vector_gets_deterministic_cell_and_bucket(spark):
    """The non-nullable join keys (r5): a NULL/malformed vector lands in
    cell/bucket 0 instead of a NULL key that would silently drop it —
    and the key column must BE non-nullable (the plan property that
    keeps the join's inferred IsNotNull from re-inlining the fold)."""
    df = spark.createDataFrame(
        [(1, None), (2, [0.1] * 64)], "vec_id long, cv array<double>"
    )
    out = S.assign_cells(df, "cv", S.lattice_centroids(64))
    cells = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert cells[1] == 0 and cells[2] >= 1
    assert not out.schema["cell"].nullable
    bucketed = df.select(S.bucket_expr(F.col("cv"), 64).alias("bucket"))
    assert not bucketed.schema["bucket"].nullable
    vals = [r["bucket"] for r in bucketed.collect()]
    assert all(v is not None for v in vals)
