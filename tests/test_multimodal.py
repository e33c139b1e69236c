"""Multimodal plumbing: binary payload column + Arrow-batched decode."""

from __future__ import annotations

import pytest

from tower_parse_spark.operators import multimodal as M


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, "a much longer document body here")],
        "doc_id long, text string",
    )


def test_payload_is_binary(docs):
    df = M.with_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"


def test_decode_stub_deterministic():
    meta = M.decode_stub(b"hello")
    assert meta == {"n_bytes": 5, "width": 16 + 5, "height": 16 + 35, "format": "webp"}


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"x")


def test_decode_payloads_distributed(docs):
    out = {r["doc_id"]: r for r in M.decode_payloads(M.with_payload(docs)).collect()}
    assert out[1]["n_bytes"] == 5
    assert out[2]["n_bytes"] == 32
    assert out[2]["format"] == ["png", "jpeg", "webp"][32 % 3]
    assert set(out[1].asDict()) == {"doc_id", "n_bytes", "width", "height", "format"}
