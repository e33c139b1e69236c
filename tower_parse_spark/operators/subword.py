"""Subword (BPE-style) token accounting for LLM training budgets.

Whitespace/regex tokens (functions/text.py::tokens / bpe_pretokens) are
the wrong unit for sequence-length budgets: packing and chunking count
SUBWORD tokens — the output of a vocabulary-driven tokenizer (BPE,
Sennrich et al. 2016 / WordPiece, Wu et al. 2016). This module is the
relational re-expression of the INFERENCE side of such a tokenizer:
greedy longest-match-first segmentation of each word against a fixed
piece vocabulary with single-character fallback (the standard
WordPiece/byte-fallback decoding discipline), as a pure fold
expression — no Python, no UDF, and an exact DuckDB twin (recursive
CTE over the same pieces).

Greedy longest-match is deterministic: at each position the longest
vocabulary piece matching the remaining suffix is consumed (ties are
impossible — pieces are unique, equal length + equal match means equal
piece); an unmatched position consumes one character as a fallback
piece. Piece COUNT is what budgets need, so only the count is
materialized; the fold carries (position, count) state and runs at most
len(word) steps.

Scale shape (100 TB corpus):

- The fold costs O(len(word) x |vocab|) per evaluation, so it runs on
  the DISTINCT-WORD relation, not per token occurrence: dedup-before-
  expensive-compute. The distinct aggregate is map-side combinable —
  each partition emits only its own vocabulary (Zipf: partition-local
  distinct words ~ corpus vocabulary, orders of magnitude below token
  count) — and the word -> count table that joins back is
  vocabulary-sized. The join-back carries NO broadcast hint (a crawl's
  raw vocabulary is unbounded garbage-heavy; AQE broadcasts when it
  fits, the common case after normalization).
- Per-document totals are one map-side-combinable aggregate on the id
  (exploded tokens co-locate with their source row).
- The piece vocabulary itself is a plan literal (a production 32k-64k
  merge table would broadcast instead; the fold is unchanged).

Reference context: the reference has no tokenizer at all (readport.py
parses sensor lines); this extends the LLM-curation accounting surface
(token_stats / doc_chunking / sequence_packing count whitespace tokens;
this adds the subword unit those budgets actually bill in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tower_parse_spark.functions import text as T

#: Pinned piece vocabulary — a miniature BPE-style merge table over the
#: fixture's closed 31-word vocabulary plus common English fragments,
#: ordered here alphabetically (the fold sorts by length internally).
#: Single characters NOT listed fall back to one piece per character.
SUBWORD_VOCAB = (
    "a", "agg", "all", "an", "ark", "ba", "big", "col", "ctor", "cust",
    "da", "eam", "er", "ery", "fa", "fil", "ge", "gr", "ha", "join",
    "key", "le", "li", "mer", "ne", "om", "ord", "oup", "pa", "qu",
    "ro", "rt", "sc", "sh", "slo", "sm", "sort", "sp", "st", "str",
    "ta", "tab", "tch", "ter", "the", "ue", "umn", "val", "ve", "w",
    "window",
)


def _pieces_desc(vocab: tuple[str, ...]) -> list[str]:
    """Longest-first (ties lexicographic) — the greedy probe order."""
    return sorted(vocab, key=lambda s: (-len(s), s))


def subword_count(
    word: Column, vocab: tuple[str, ...] = SUBWORD_VOCAB
) -> Column:
    """Number of greedy longest-match subword pieces in *word* (int).

    A fold over at most ``length(word)`` steps: state (pos, cnt) starts
    at (1, 0); each live step consumes the longest piece matching at
    ``pos`` (else 1 fallback character) and increments the count; steps
    after the word is exhausted are no-ops. Empty input counts 0.

    Twin: :func:`sql_subword_walk` (recursive CTE, same pieces, same
    longest-match rule via max(length) over matching pieces)."""
    pieces = F.array(*[F.lit(p) for p in _pieces_desc(vocab)])
    init = F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt"))

    def step(st: Column, _i: Column) -> Column:
        pos, cnt = st["pos"], st["cnt"]
        matched = F.filter(
            pieces, lambda p: F.substring(word, pos, F.length(p)) == p
        )
        plen = F.when(
            F.size(matched) > 0, F.length(F.element_at(matched, 1))
        ).otherwise(F.lit(1))
        return F.when(pos > F.length(word), st).otherwise(
            F.struct((pos + plen).alias("pos"), (cnt + 1).alias("cnt"))
        )

    steps = F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1)))
    return F.aggregate(steps, init, step, lambda st: st["cnt"])


def doc_subword_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: tuple[str, ...] = SUBWORD_VOCAB,
) -> DataFrame:
    """Per-document subword accounting: whitespace words, subword
    pieces, and the pieces-per-word expansion ratio.

    The fold runs once per DISTINCT word (see module docstring); the
    join-back is AQE-decided. Zero-token and NULL-text documents keep a
    row (all-zero counts) via explode_outer."""
    from tower_parse_spark.functions.rounding import pround

    exploded = df.select(
        F.col(id_col),
        F.explode_outer(T.tokens(F.col(text_col))).alias("_tok"),
    )
    words = (
        exploded.filter(F.col("_tok").isNotNull())
        .select("_tok")
        .distinct()
        .select("_tok", subword_count(F.col("_tok"), vocab).alias("_n_sub"))
    )
    return (
        exploded.join(words, "_tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("_tok")).alias("n_words"),
            F.coalesce(F.sum("_n_sub"), F.lit(0)).alias("n_subwords"),
        )
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.col("n_subwords").cast("long").alias("n_subwords"),
            pround(
                F.when(
                    F.col("n_words") > 0,
                    F.col("n_subwords") / F.col("n_words"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("subwords_per_word"),
        )
    )


def sql_pieces_values(vocab: tuple[str, ...] = SUBWORD_VOCAB) -> str:
    """The piece vocabulary as a DuckDB list literal."""
    quoted = ", ".join("'" + p.replace("'", "''") + "'" for p in vocab)
    return f"[{quoted}]"


def sql_subword_walk(
    words_cte: str, vocab: tuple[str, ...] = SUBWORD_VOCAB
) -> str:
    """DuckDB CTE chain computing ``subcnt(tok, n_sub)`` for every row
    of *words_cte* (a CTE exposing a distinct ``tok`` column) — the
    recursive-CTE twin of :func:`subword_count`. Must be spliced into a
    ``WITH RECURSIVE`` clause."""
    return f"""pieces AS (
  SELECT unnest({sql_pieces_values(vocab)}) AS p
), posm AS (
  SELECT tok, pos,
         coalesce(max(CASE WHEN substr(tok, CAST(pos AS INT), length(p)) = p
                           THEN length(p) END), 1) AS plen
  FROM (SELECT tok, unnest(range(1, length(tok) + 1)) AS pos FROM {words_cte})
  CROSS JOIN pieces
  GROUP BY tok, pos
), walk AS (
  SELECT tok, 1 AS pos, 0 AS cnt FROM {words_cte}
  UNION ALL
  SELECT w.tok, w.pos + pm.plen, w.cnt + 1
  FROM walk w JOIN posm pm ON pm.tok = w.tok AND pm.pos = w.pos
  WHERE w.pos <= length(w.tok)
), subcnt AS (
  SELECT tok, max(cnt) AS n_sub FROM walk GROUP BY tok
)"""
