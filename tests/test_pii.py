"""PII redaction + chunking primitives (functions/pii.py, text.chunk_starts).

Unit-level: handcrafted strings with known PII through the JVM regex
expressions; chunk geometry edges (short doc, exact multiple, overlap).
The oracle queries (text_pii_redact, doc_chunking) cover engine parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.functions import pii
from tower_parse_spark.functions.text import chunk_starts, tokens


def _one(spark, text: str):
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii.pii_counts(F.col("text"))
    return df.select(
        pii.redact_pii(F.col("text")).alias("red"),
        *[c.alias(n) for n, c in counts.items()],
    ).collect()[0]


def test_redacts_email_phone_ip(spark):
    r = _one(
        spark,
        "mail a.b+c@test-site.org or call +1 555-010-1234, host 10.0.3.44 ok",
    )
    assert r["red"] == "mail <EMAIL> or call <PHONE>, host <IP> ok"
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)


def test_redaction_order_email_wins_over_phone(spark):
    # digits inside an email local part must not leak a <PHONE> tag
    r = _one(spark, "x 5550101234a@example.com y")
    assert r["red"] == "x <EMAIL> y"
    assert r["n_phones"] == 0


def test_clean_text_untouched(spark):
    r = _one(spark, "no pii here just words")
    assert r["red"] == "no pii here just words"
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)


def test_multiple_matches_all_replaced(spark):
    r = _one(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8")
    assert r["red"] == "<EMAIL> <EMAIL> <IP> <IP>"
    assert r["n_emails"] == 2 and r["n_ips"] == 2


def _starts(spark, text: str, stride: int):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        chunk_starts(tokens(F.col("text")), stride).alias("s")
    ).collect()[0]["s"]


def test_chunk_starts_geometry(spark):
    # 7 tokens, stride 3 -> starts 1, 4, 7
    assert _starts(spark, "a b c d e f g", 3) == [1, 4, 7]
    # doc shorter than stride -> single chunk
    assert _starts(spark, "a b", 24) == [1]
    # empty doc -> no chunks
    assert _starts(spark, "", 24) == []
    # exact multiple: 6 tokens stride 3 -> 1, 4 (start 7 > len)
    assert _starts(spark, "a b c d e f", 3) == [1, 4]
