"""Benchmark decontamination (operators/decontam.py).

Checks the semantics (any shared word n-gram flags the doc), the
short-document guard, and that the plan keeps its 100 TB shape: the
corpus side must reach the gram join without an Exchange (benchmark
broadcast), because shuffling the corpus is exactly what the operator
exists to avoid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators.decontam import (
    flag_contaminated,
    flag_contaminated_fuzzy,
    ngram_hash_set,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "completely unrelated words here nothing shared at all"),
        (4, "tiny doc"),  # < n tokens -> zero grams
        (5, "the quick brown cat naps all day long"),  # shares 'the quick brown'
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def bench_set(spark):
    rows = [
        (100, "we measure the quick brown fox benchmark accuracy"),
        (101, "pack my box with care always"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flags_overlapping_docs(spark, corpus, bench_set):
    out = {
        r.doc_id: (r.n_shared_grams, r.contaminated)
        for r in flag_contaminated(corpus, bench_set, n=3).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 1 shares 'the quick brown' + 'quick brown fox'
    assert out[1] == (2, True)
    # doc 2 shares 'pack my box' + 'my box with'
    assert out[2] == (2, True)
    assert out[3] == (0, False)
    assert out[4] == (0, False)  # too short for any 3-gram
    assert out[5] == (1, True)  # 'the quick brown' only


def test_gram_width_matters(spark, corpus, bench_set):
    # at n=4 the only 4-token overlap is doc1's 'the quick brown fox'
    out = {
        r.doc_id: r.contaminated
        for r in flag_contaminated(corpus, bench_set, n=4).collect()
    }
    assert out[1] is True
    assert out[5] is False  # 3-gram overlap is not a 4-gram overlap


def test_gram_set_is_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    arr = ngram_hash_set(df, n=2).select("_grams").first()._grams
    # shingles: (a b), (b a), (a b), (b a), (a b) -> 2 distinct
    assert len(arr) == 2


def test_corpus_side_not_shuffled(spark, corpus, bench_set):
    plan = flag_contaminated(corpus, bench_set)._jdf.queryExecution().executedPlan().toString()
    import re

    # The corpus GRAM stream (the text-bearing, corpus-sized relation)
    # must reach its join via BroadcastHashJoin — a shuffle there would
    # defeat the operator's 100 TB design. The verdict join-back is
    # deliberately UNhinted (ADVICE r7: |hits| is unbounded), so the
    # static plan shows an SMJ shuffling only the id-only corpus
    # projection + the hits aggregate; AQE broadcasts it at runtime
    # when hits is in fact small. Allowed exchanges: benchmark gram-set
    # distinct (gram), per-doc hit count (doc_id), join-back id
    # projection (doc_id).
    shuffles = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert sorted(shuffles) == ["doc_id", "doc_id", "gram"], plan
    assert plan.count("BroadcastHashJoin") == 1, plan


def test_fuzzy_flags_exact_and_reworded_copies(spark, bench_set):
    rows = [
        # exact copy of bench 100 -> every minhash slot agrees
        (1, "we measure the quick brown fox benchmark accuracy"),
        # lightly reworded copy of bench 100 -> most slots agree
        (2, "we measure the quick brown fox benchmark accuracy today"),
        # unrelated
        (3, "completely unrelated words here nothing shared at all"),
        # < 3 tokens -> shingle-less, never banded
        (4, "tiny doc"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in flag_contaminated_fuzzy(corpus, bench_set).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].contaminated and out[1].max_est_jaccard == 1.0
    assert out[2].contaminated and 0.5 <= out[2].max_est_jaccard < 1.0
    assert not out[3].contaminated and out[3].max_est_jaccard == 0.0
    assert not out[4].contaminated
    assert out[1].n_bench_matches == 1


def test_fuzzy_threshold_gates_matches(spark, bench_set):
    corpus = spark.createDataFrame(
        [(2, "we measure the quick brown fox benchmark accuracy today")],
        "doc_id long, text string",
    )
    loose = flag_contaminated_fuzzy(corpus, bench_set, threshold=0.5).first()
    strict = flag_contaminated_fuzzy(
        corpus, bench_set, threshold=1.0
    ).first()
    assert loose.contaminated
    assert not strict.contaminated and strict.max_est_jaccard == 0.0


def test_fuzzy_corpus_never_shuffled(spark, corpus, bench_set):
    plan = (
        flag_contaminated_fuzzy(corpus, bench_set)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # allowed hash exchanges: the candidate-pair dedupe (cid, bid), the
    # per-doc hit aggregate (cid), and the UNhinted verdict join-back's
    # id-only corpus projection (doc_id — ADVICE r7, AQE broadcasts it
    # at runtime when hits is small). The banded corpus stream (the
    # text-bearing relation) must hit the benchmark via
    # BroadcastHashJoin — never hash-partitioned.
    shuffles = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert sorted(shuffles) == ["cid", "cid", "doc_id"], plan
    assert plan.count("BroadcastHashJoin") == 1, plan


def test_gram_hashing_stays_staged(spark, corpus, bench_set):
    # Regression for the InferFiltersFromGenerate blowup: with a plain
    # explode the optimizer pushes a synthesized `size(_grams) > 0`
    # filter below the staged projections, inlining the md5 token-hash
    # transform at every element_at site (measured 33x at sf0.1). With
    # explode_outer the md5 transform must appear exactly once per
    # document scan: once for the corpus side, once for the benchmark
    # side, and once in the final flag join's re-scan of corpus ids —
    # i.e. a small constant, not O(grams per doc).
    plan = (
        flag_contaminated(corpus, bench_set)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5") <= 3, f"md5 inlined {plan.count('md5')}x"
