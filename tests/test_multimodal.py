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


def test_decode_real_without_pillow_names_the_dependency():
    """Where Pillow is absent the error must name the optional dep (not
    a bare executor-side ImportError); where present, decode_real is the
    real decoder and the skip-gated test below covers it."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="pillow"):
            M.decode_real(b"x")
    else:
        pytest.skip("Pillow installed — covered by the real-decode test")


def test_decode_real_with_pillow(spark):
    """Real PNG decode through the full Arrow/mapInPandas path (runs
    wherever the optional Pillow dependency is installed)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    assert M.decode_real(png) == {
        "n_bytes": len(png), "width": 20, "height": 10, "format": "png"
    }
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    out = M.decode_payloads(df, decoder=M.decode_real).collect()
    assert [
        (r["doc_id"], r["width"], r["height"], r["format"]) for r in out
    ] == [(1, 20, 10, "png")]


def test_decode_payloads_distributed(docs):
    out = {r["doc_id"]: r for r in M.decode_payloads(M.with_payload(docs)).collect()}
    assert out[1]["n_bytes"] == 5
    assert out[2]["n_bytes"] == 32
    assert out[2]["format"] == ["png", "jpeg", "webp"][32 % 3]
    assert set(out[1].asDict()) == {"doc_id", "n_bytes", "width", "height", "format"}
