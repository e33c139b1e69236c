"""Sequence packing: map documents onto fixed-length training sequences.

LLM pre-training consumes fixed-size token windows (the context length),
not documents. The standard public preparation step (GPT-2/3, Pile, Dolma
"concat-and-chunk") concatenates documents into a token stream and cuts
it every ``seq_tokens`` tokens; each document then occupies a contiguous
byte range of the stream, possibly straddling sequence boundaries.

Scale shape for 100 TB:

- the corpus is split into ``shards`` INDEPENDENT streams by a
  deterministic hash of the document id (``sampling.hash_bucket`` — md5,
  engine-portable, retry-stable). Real pipelines shard exactly like this
  (one output file per shard); sharding is what keeps the global
  "running offset" from serializing the whole corpus through one task.
- within a shard, documents are ordered by id and the running token
  offset is ONE window cumulative sum — a single hash-partition shuffle
  on ``shard``, then a sort + linear scan per partition. No explode: a
  document's sequence span is pure arithmetic on (start, end) offsets
  (first_seq = start // L, last_seq = (end-1) // L).
- shard count trades parallelism against stream continuity; at cluster
  scale set it to a small multiple of executor cores. Packing quality is
  unaffected (every shard cuts exactly at L-token multiples; only the
  final partial sequence per shard is padded, i.e. waste <= shards * L
  tokens corpus-wide).

Tokenless documents (NULL/empty/whitespace text) are excluded before
offsets are assigned — identically in the DuckDB oracle, where
``len(toks)`` is NULL for NULL text — so they can never shift another
document's offsets.

Token unit: offsets here count WHITESPACE tokens (functions/text.py::
tokens). Production packing budgets bill in SUBWORD tokens; the
vocabulary-driven count lives in operators/subword.py (r8,
``token_count_bpe``) and slots in by swapping the per-doc token-count
expression — the offset/cumsum machinery is unit-agnostic. The fixture
queries keep the whitespace unit so the two packing oracles stay
independent of the piece vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tower_parse_spark.functions.text import tokens
from tower_parse_spark.operators.sampling import hash_bucket, sql_hash_bucket

#: tokens per packed training sequence (the "context length"; small here
#: because the synthetic docs are short — production: 2048/4096/8192)
SEQ_TOKENS = 64

#: independent packing streams; production: a small multiple of cores
N_SHARDS = 8

#: salt decorrelating the packing shard from the train/val split bucket
PACK_SALT = "pack"


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = SEQ_TOKENS,
    shards: int = N_SHARDS,
) -> DataFrame:
    """Assign every document its span in the packed sequence space.

    Returns one row per token-bearing document: ``(id, shard, n_tokens,
    start_off, first_seq, last_seq, n_seqs)`` where offsets count tokens
    within the document's shard stream and sequence ids are
    ``offset // seq_tokens``. ``n_seqs`` > 1 means the document straddles
    a context boundary (training-time attention masking / document
    truncation decisions key off exactly this).
    """
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    sized = df.select(
        F.col(id_col),
        (hash_bucket(F.col(id_col), PACK_SALT) % shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    end_off = F.sum("n_tokens").over(w)
    start_off = (end_off - F.col("n_tokens")).alias("start_off")
    first_seq = F.floor((end_off - F.col("n_tokens")) / seq_tokens)
    last_seq = F.floor((end_off - 1) / seq_tokens)
    return sized.select(
        id_col,
        "shard",
        "n_tokens",
        start_off,
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


def sql_pack_sequences(
    docs_rel: str,
    toks_sql: str,
    id_col: str = "doc_id",
    seq_tokens: int = SEQ_TOKENS,
    shards: int = N_SHARDS,
) -> str:
    """DuckDB twin of :func:`pack_sequences` over *docs_rel* (ends with a
    ``packed`` relation; compose with a final SELECT)."""
    return f"""sized AS (
  SELECT {id_col},
         {sql_hash_bucket(id_col, PACK_SALT)} % {shards} AS shard,
         CAST(len({toks_sql}) AS BIGINT) AS n_tokens
  FROM {docs_rel}
), nz AS (
  SELECT * FROM sized WHERE n_tokens > 0
), packed AS (
  SELECT {id_col}, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_off,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
           // {seq_tokens} AS first_seq,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                              ROWS UNBOUNDED PRECEDING) - 1)
           // {seq_tokens} AS last_seq
  FROM nz
)"""
