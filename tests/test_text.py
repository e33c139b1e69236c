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
