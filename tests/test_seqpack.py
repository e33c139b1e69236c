"""Sequence packing (operators/seqpack.py).

Semantics (offsets tile each shard stream exactly; sequence ids are
offset arithmetic), the tokenless-document exclusion, parameter
validation, and the 100 TB plan shape (exactly one shuffle, on the
shard key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators.seqpack import pack_sequences


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a b c d e f g"),  # 7 tokens
        (2, "h i j k"),  # 4 tokens
        (3, "l m n o p q r s t u v w"),  # 12 tokens
        (4, ""),  # tokenless -> excluded
        (5, None),  # NULL text -> excluded
        (6, "x y z"),  # 3 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_shard_spans(spark, docs):
    out = {
        r.doc_id: r
        for r in pack_sequences(
            docs, seq_tokens=10, shards=1
        ).collect()
    }
    # tokenless docs never get a span
    assert set(out) == {1, 2, 3, 6}
    # stream order is doc_id: 7 + 4 + 12 + 3 tokens
    assert (out[1].start_off, out[1].first_seq, out[1].last_seq) == (0, 0, 0)
    # doc 2 spans tokens [7, 11) -> crosses the 10-token boundary
    assert (out[2].start_off, out[2].first_seq, out[2].last_seq) == (7, 0, 1)
    assert out[2].n_seqs == 2
    # doc 3 spans [11, 23) -> sequences 1..2
    assert (out[3].start_off, out[3].first_seq, out[3].last_seq) == (11, 1, 2)
    # doc 6 spans [23, 26)
    assert (out[6].start_off, out[6].first_seq, out[6].last_seq) == (23, 2, 2)
    assert out[6].n_seqs == 1


def test_exact_boundary_doc_stays_in_one_sequence(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r for r in pack_sequences(df, seq_tokens=4, shards=1).collect()
    }
    # doc 2 occupies exactly [4, 8) -> entirely sequence 1, no straddle
    assert (out[2].first_seq, out[2].last_seq, out[2].n_seqs) == (1, 1, 1)


def test_shard_streams_tile_independently(spark):
    rows = [(i, "w " * (i % 5 + 1)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_tokens=8, shards=4).collect()
    shards = {r.shard for r in out}
    assert shards <= set(range(4)) and len(shards) > 1
    for s in shards:
        span = sorted(
            (r.start_off, r.n_tokens) for r in out if r.shard == s
        )
        # offsets tile the shard stream with no gaps or overlaps
        pos = 0
        for start, n in span:
            assert start == pos
            pos += n


def test_subword_billing_side_by_side(spark, docs):
    """r9: subword_vocab adds the sub_* columns without touching the
    whitespace spans, and both units tile each shard stream."""
    vocab = ("ab", "lm", "no", "xyz", "x")  # multi-char pieces + fallback
    plain = {r.doc_id: r for r in pack_sequences(docs, seq_tokens=10).collect()}
    both = {
        r.doc_id: r
        for r in pack_sequences(
            docs, seq_tokens=10, subword_vocab=vocab
        ).collect()
    }
    assert set(both) == set(plain)
    for d, p in plain.items():
        b = both[d]
        # whitespace columns bit-identical with and without the option
        assert (
            p.shard, p.n_tokens, p.start_off, p.first_seq, p.last_seq, p.n_seqs
        ) == (
            b.shard, b.n_tokens, b.start_off, b.first_seq, b.last_seq, b.n_seqs
        )
        # every word is >= 1 piece
        assert b.n_subwords >= b.n_tokens
    # single-char words count 1 piece each; 'x y z' -> x|y|z = 3
    assert both[6].n_subwords == 3
    # subword offsets tile each shard stream exactly, like whitespace
    rows = pack_sequences(docs, seq_tokens=10, subword_vocab=vocab).collect()
    for s in {r.shard for r in rows}:
        pos = 0
        for start, n in sorted(
            (r.sub_start_off, r.n_subwords) for r in rows if r.shard == s
        ):
            assert start == pos
            pos += n


def test_subword_billing_single_shuffle(spark, docs):
    """The second unit rides the SAME shard window — still exactly one
    hashpartitioning exchange on shard (the doc-id aggregate underneath
    is AQE-planned from the exploded relation, not a second window)."""
    import re

    plan = (
        pack_sequences(docs, subword_vocab=("ab",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    window_shuffles = re.findall(r"Exchange hashpartitioning\(shard#", plan)
    assert len(window_shuffles) == 1, plan


def test_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences(docs, seq_tokens=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(docs, shards=0)


def test_one_shuffle_on_shard(spark, docs):
    plan = (
        pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert shuffles == ["shard"], plan
