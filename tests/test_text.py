"""Text-analysis primitives: tokenization, hashing, lang-ID, quality,
fingerprints. All pure-expression (no UDF); asserted on literal rows."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.functions import text as T


def one(spark, col, value="x"):
    return spark.createDataFrame([(value,)], "text string").select(
        col.alias("v")
    ).collect()[0]["v"]


def test_tokens_basic(spark):
    assert one(spark, T.tokens(F.col("text")), "The cat, the hat!") == [
        "the",
        "cat",
        "the",
        "hat",
    ]


@pytest.mark.parametrize("s", ["", "   ", "!!!,,,"])
def test_tokens_degenerate(spark, s):
    assert one(spark, T.tokens(F.col("text")), s) == []


def test_token_hash_is_md5_prefix(spark):
    # portable hash contract: first 15 hex chars of md5 as int
    expected = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert one(spark, T.token_hash(F.col("text")), "hello") == expected


def test_shingles_order_and_count(spark):
    toks = T.tokens(F.col("text"))
    got = one(spark, T.shingles(toks, 3), "a b c d e")
    assert got == ["a b c", "b c d", "c d e"]


def test_shingles_short_input(spark):
    toks = T.tokens(F.col("text"))
    # fewer tokens than n -> no shingles (matches the SQL twin's range())
    assert one(spark, T.shingles(toks, 3), "a b") == []
    assert one(spark, T.shingles(toks, 3), "") == []


def test_stopword_hits_distinct(spark):
    toks = T.tokens(F.col("text"))
    # 'the' twice counts once (distinct), 'and' once, 'cat' never
    assert one(spark, T.stopword_hits(toks, "en"), "the the and cat") == 2


def test_predicted_lang(spark):
    toks = T.tokens(F.col("text"))
    en = "the cat and the hat is in that house"
    de = "der hund und die katze ist nicht mit"
    assert one(spark, T.predicted_lang(toks), en) == "en"
    assert one(spark, T.predicted_lang(toks), de) == "de"


def test_rolling_fingerprint_order_sensitive(spark):
    toks = T.tokens(F.col("text"))
    fp = T.rolling_fingerprint(toks)
    assert one(spark, fp, "a b c") != one(spark, fp, "c b a")
    assert one(spark, fp, "a b c") == one(spark, fp, "a b c")


def test_quality_features_known_values(spark):
    feats = T.quality_features(F.col("text"))
    row = (
        spark.createDataFrame([("the cat sat.",)], "text string")
        .select(
            feats["n_tokens"].alias("nt"),
            feats["n_punct"].alias("np"),
            feats["stopword_ratio"].alias("sr"),
            feats["avg_token_len"].alias("al"),
        )
        .collect()[0]
    )
    assert row["nt"] == 3
    assert row["np"] == 1
    assert row["sr"] == pytest.approx(1 / 3)
    assert row["al"] == pytest.approx((3 + 3 + 3) / 3)


def test_bpe_pretokens(spark):
    """GPT-2-shaped pre-tokenization: contractions split, space glued to
    the following word, digit runs separate."""
    df = spark.createDataFrame([("It's over 9000 tokens!",)], "text string")
    row = df.select(T.bpe_pretokens(F.col("text")).alias("t")).collect()[0]
    assert row["t"] == ["it", "'s", " over", " 9000", " tokens", "!"]


# ---- query-level tests for the r5 text-analysis additions ------------------


def _docs_dir(spark, tmp_path, rows):
    """Write a crafted documents table in the fixture schema; the query
    functions take any sf_dir-shaped directory."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_text_repetition_crafted(spark, tmp_path):
    from tower_parse_spark.queries.llm import text_repetition

    rows = [
        (1, "a a a a", "en", "s0", 7),  # maximal repetition
        (2, "one", "en", "s0", 3),  # single token: no bigrams/trigrams
        (3, "w x y z", "en", "s0", 7),  # all unique
    ]
    out = {
        r["doc_id"]: r
        for r in text_repetition(spark, _docs_dir(spark, tmp_path, rows)).collect()
    }
    r1 = out[1]
    assert r1["unique_token_ratio"] == 0.25
    # trigrams: ["a a a", "a a a"] -> 1 distinct of 2
    assert r1["dup_trigram_frac"] == 0.5
    assert r1["top_bigram"] == "a a" and r1["top_bigram_frac"] == 1.0
    r2 = out[2]
    assert r2["top_bigram"] == "" and r2["top_bigram_frac"] == 0.0
    assert r2["dup_trigram_frac"] == 0.0 and r2["unique_token_ratio"] == 1.0
    r3 = out[3]
    assert r3["unique_token_ratio"] == 1.0 and r3["dup_trigram_frac"] == 0.0
    # three bigrams, each count 1 -> lexicographically-first wins the tie
    assert r3["top_bigram"] == "w x" and r3["top_bigram_frac"] == 0.3333


def test_text_tfidf_crafted(spark, tmp_path):
    import math

    from tower_parse_spark.queries.llm import text_tfidf_topterms

    rows = [
        (1, "apple apple banana", "en", "s0", 18),
        (2, "banana cherry", "en", "s0", 13),
        (3, "cherry cherry cherry", "en", "s0", 20),
    ]
    out = text_tfidf_topterms(spark, _docs_dir(spark, tmp_path, rows)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc-unique term with the highest tf*idf wins rank 1
    top1 = by_doc[1][0]
    assert top1["rank"] == 1 and top1["token"] == "apple" and top1["tf"] == 2
    assert top1["tfidf"] == round(2 * math.log(3.0 / 1), 4)
    # df counts span docs: banana in 2 docs, cherry in 2 docs
    top3 = by_doc[3][0]
    assert top3["token"] == "cherry"
    assert top3["tfidf"] == round(3 * math.log(3.0 / 2), 4)
    # ranks are contiguous from 1 and never exceed the doc's vocab
    for doc_id, rs in by_doc.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3


def test_quality_filter_funnel_crafted_and_monotone(spark, tmp_path):
    from tower_parse_spark.queries import llm

    long_unique = " ".join(f"t{i}" for i in range(25))  # 25 unique tokens
    rows = [
        # passes length + repetition + langid (zero stopword hits
        # everywhere -> tie at 0 -> lexicographically-first 'de')
        (1, long_unique, "de", "s0", len(long_unique)),
        (2, "too short", "de", "s0", 9),  # fails the length stage
        # passes length, fails the unique-ratio stage
        (3, "a a " * 15, "de", "s1", 60),
    ]
    out = {
        r["source"]: r
        for r in llm.quality_filter_funnel(
            spark, _docs_dir(spark, tmp_path, rows)
        ).collect()
    }
    s0 = out["s0"]
    assert (s0["n_docs"], s0["n_pass_length"]) == (2, 1)
    assert (s0["n_pass_repetition"], s0["n_pass_langid"]) == (1, 1)
    assert s0["avg_survivor_quality"] > 0
    s1 = out["s1"]
    assert (s1["n_pass_length"], s1["n_pass_repetition"]) == (1, 0)
    assert s1["avg_survivor_quality"] == 0.0  # no survivors -> 0, not NULL
    # funnel stages are monotone by construction on the real fixture too
    for r in llm.quality_filter_funnel(spark, "/root/testdata/sf0.001").collect():
        assert (
            r["n_docs"]
            >= r["n_pass_length"]
            >= r["n_pass_repetition"]
            >= r["n_pass_langid"]
        )


def test_repetition_tokenization_stays_staged(spark):
    """Regression for the InferFiltersFromGenerate blowup (the decontam
    round-3 lesson, re-hit by text_repetition in round 5): with a plain
    explode the optimizer pushes a synthesized ``size(_bigrams) > 0``
    filter below the staged projections, inlining the tokenization into
    the per-element shingle lambdas — measured 29 s -> 2 s at sf0.1.
    With explode_outer + null filter the regexp tokenization must appear
    a small constant number of times (one per scan branch, two textual
    occurrences each), not O(tokens per doc)."""
    from tower_parse_spark.queries.llm import text_repetition

    plan = (
        text_repetition(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    n = plan.count("regexp_replace")
    assert n <= 4, f"tokenization inlined {n}x"
