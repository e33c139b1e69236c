"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a pointer to object storage) next to a typed
metadata struct; run decode / feature-extraction / resize / frame-sample
as Arrow-batched Pandas functions over ``mapInPandas`` so each task
processes whole record batches without JVM<->Python per-row cost.

The decode step itself is STUBBED here (no image/audio libs in this
container): ``decode_stub`` derives deterministic fake metadata from the
bytes, and ``decode_real`` raises NotImplementedError with the intended
signature. The Spark-side plumbing — schema, batch iteration, partition
behavior — is real and oracle-checked (queries/llm.py::multimodal_decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of *text_col* as the
    opaque payload column (deterministic; real tables would carry actual
    image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'image decode': metadata derived from bytes.

    Stands in for e.g. PIL.Image.open(io.BytesIO(payload)); the derived
    fields are arithmetic on the byte length so the full mapInPandas
    pipeline has an exact SQL oracle.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + n % 64,
        "height": 16 + (n * 7) % 64,
        "format": ["png", "jpeg", "webp"][n % 3],
    }


def decode_real(payload: bytes) -> dict:  # pragma: no cover - by design
    """The real decoder hook (image/audio libs not in this container)."""
    raise NotImplementedError(
        "plug a real decoder here, e.g. PIL.Image.open(io.BytesIO(payload))"
    )


def decode_batches(
    it: Iterator[pd.DataFrame], decoder=decode_stub
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: whole Arrow batches in, decoded metadata out."""
    for pdf in it:
        metas = [decoder(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def decode_payloads(df_with_payload: DataFrame) -> DataFrame:
    """Distributed decode: Arrow-batched Pandas over every partition."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )
