"""Rule-based document quality filtering for LLM corpus curation.

Two public-methodology families, both pure ``pyspark.sql.functions``
expressions (JVM-side, whole-stage-codegen'd — a 100 TB documents table
runs them inside the parquet scan projection, no Python, no shuffle
until the caller aggregates):

- :func:`gopher_signals` — the Gopher quality heuristics (Rae et al.
  2021, "Scaling Language Models: ... Gopher", Table A1): word-count
  bounds, mean-word-length bounds, symbol-to-word ratio (``#`` and
  ``...``), bullet-line and ellipsis-line fractions, alphabetic-word
  fraction, and the required-stopword containment rule. Emitted as one
  row of signals per document plus a deterministic first-failing-rule
  verdict, so downstream funnels can both filter and attribute drops.

- :func:`clean_lines` / :func:`line_cleaning_stats` — C4-style
  line-level cleaning (Raffel et al. 2020 §2.2, refined by RefinedWeb):
  keep only lines with enough words that end in terminal punctuation
  and carry no boilerplate marker (javascript/cookie/lorem-ipsum/"{"),
  then keep only documents that retain enough lines.

Reference context: the reference has no quality filtering at all
(readport.py is a fixed-format ingest pipeline); this module is part of
the LLM-pipeline extension surface BASELINE.json directs ("text
analysis" / curation families). Every constant is shared with the
DuckDB oracle twins in queries/filtering.py so the two engines cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tower_parse_spark.functions import text as T
from tower_parse_spark.functions.rounding import pround

# --------------------------------------------------------------------------
# Gopher rule thresholds (Rae et al. 2021, Table A1)
# --------------------------------------------------------------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
#: the paper's "must contain >= 2 of" stop-word list
GOPHER_REQUIRED_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_STOP_HITS = 2

# --------------------------------------------------------------------------
# C4 line-cleaning constants (Raffel et al. 2020 §2.2)
# --------------------------------------------------------------------------
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
#: case-insensitive substrings that mark a line as boilerplate
C4_BAD_SUBSTRINGS = ("javascript", "lorem ipsum", "cookie", "{")
#: characters a kept line must end with
C4_TERMINAL_CHARS = (".", "!", "?", '"')


def _count_occurrences(col: Column, pattern: str, width: int) -> Column:
    """Non-overlapping occurrence count of a fixed-width regex literal:
    (len(x) - len(x with matches removed)) / width. Exact integer in
    both engines (the difference is always a multiple of *width*)."""
    removed = F.regexp_replace(col, pattern, "")
    return ((F.length(col) - F.length(removed)) / F.lit(width)).cast("long")


def gopher_signals(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Gopher quality signals + verdict over a document
    rendered as an array of lines.

    All signals are array/string expressions over ONE rendered string
    and ONE tokenization of it — no explode, no shuffle; ``fail_reason``
    is the FIRST failing rule in the paper's order (deterministic drop
    attribution), ``'pass'`` otherwise. Ratio columns are emitted
    pround(4) but every threshold comparison runs on the raw double so
    the verdict never depends on display rounding.
    """
    lines = F.col(lines_col)
    rendered = F.array_join(lines, "\n")
    d = df.select(
        id_col,
        lines,
        rendered.alias("_rendered"),
        T.tokens(rendered).alias("_rtoks"),
    )
    n_lines = F.size(lines)
    n_words = F.size(F.col("_rtoks"))
    mean_wl = F.when(
        n_words > 0,
        F.length(F.array_join(F.col("_rtoks"), "")) / n_words,
    ).otherwise(F.lit(0.0))
    n_sym = _count_occurrences(F.col("_rendered"), "#", 1) + _count_occurrences(
        F.col("_rendered"), r"\.\.\.", 3
    )
    symbol_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.startswith("- "))) / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.endswith("..."))) / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(F.col("_rtoks"), lambda w: w.rlike("[a-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    stop_hits = T.wordlist_hits(F.col("_rtoks"), GOPHER_REQUIRED_STOPWORDS)
    sig = d.select(
        id_col,
        n_lines.alias("n_lines"),
        n_words.alias("n_words"),
        mean_wl.alias("_mean_wl"),
        symbol_ratio.alias("_symbol_ratio"),
        bullet_frac.alias("_bullet_frac"),
        ellipsis_frac.alias("_ellipsis_frac"),
        alpha_frac.alias("_alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    fail = (
        # fail CLOSED on malformed input: a NULL lines column (operator
        # called directly, not via a guarded fixture rendering) makes
        # every signal and every when-condition NULL, which would fall
        # through to 'pass' — a malformed document must never pass
        # quality filtering (mirrored in the oracle CASE)
        F.when(
            F.col("n_lines").isNull() | F.col("n_words").isNull(),
            F.lit("malformed"),
        )
        .when(
            (F.col("n_words") < GOPHER_MIN_WORDS)
            | (F.col("n_words") > GOPHER_MAX_WORDS),
            F.lit("words"),
        )
        .when(
            (F.col("_mean_wl") < GOPHER_MIN_MEAN_WORD_LEN)
            | (F.col("_mean_wl") > GOPHER_MAX_MEAN_WORD_LEN),
            F.lit("word_len"),
        )
        .when(F.col("_symbol_ratio") > GOPHER_MAX_SYMBOL_RATIO, F.lit("symbol_ratio"))
        .when(F.col("_bullet_frac") > GOPHER_MAX_BULLET_FRAC, F.lit("bullet"))
        .when(F.col("_ellipsis_frac") > GOPHER_MAX_ELLIPSIS_FRAC, F.lit("ellipsis"))
        .when(F.col("_alpha_frac") < GOPHER_MIN_ALPHA_FRAC, F.lit("alpha"))
        .when(F.col("stop_hits") < GOPHER_MIN_STOP_HITS, F.lit("stopwords"))
        .otherwise(F.lit("pass"))
    )
    return sig.select(
        id_col,
        "n_lines",
        "n_words",
        pround(F.col("_mean_wl"), 4).alias("mean_word_len"),
        pround(F.col("_symbol_ratio"), 4).alias("symbol_ratio"),
        pround(F.col("_bullet_frac"), 4).alias("bullet_frac"),
        pround(F.col("_ellipsis_frac"), 4).alias("ellipsis_frac"),
        pround(F.col("_alpha_frac"), 4).alias("alpha_frac"),
        "stop_hits",
        fail.alias("fail_reason"),
        (fail == "pass").alias("passes"),
    )


def _line_kept(l: Column) -> Column:
    """C4 keep-predicate for one line: enough words, terminal
    punctuation, no boilerplate marker (case-insensitive)."""
    enough = F.size(T.tokens(l)) >= C4_MIN_LINE_WORDS
    terminal = F.substring(l, -1, 1).isin(*C4_TERMINAL_CHARS)
    low = F.lower(l)
    clean = None
    for s in C4_BAD_SUBSTRINGS:
        c = F.instr(low, s) == 0
        clean = c if clean is None else (clean & c)
    return enough & terminal & clean


def clean_lines(lines: Column) -> Column:
    """The surviving lines of a document under the C4 rules — a pure
    array expression, usable inside any projection."""
    return F.filter(lines, _line_kept)


def line_cleaning_stats(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document C4 line-cleaning report: lines in/kept/dropped,
    surviving characters, and the document-level keep verdict
    (>= C4_MIN_KEPT_LINES surviving lines)."""
    lines = F.col(lines_col)
    d = df.select(id_col, lines, clean_lines(lines).alias("_kept"))
    n_lines = F.size(lines)
    n_kept = F.size(F.col("_kept"))
    return d.select(
        id_col,
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        (n_lines - n_kept).alias("n_dropped"),
        F.length(F.array_join(F.col("_kept"), "\n")).alias("kept_chars"),
        F.when(n_lines > 0, n_kept / n_lines).otherwise(F.lit(0.0)).alias("_kf"),
        (n_kept >= C4_MIN_KEPT_LINES).alias("doc_kept"),
    ).select(
        id_col,
        "n_lines",
        "n_kept",
        "n_dropped",
        "kept_chars",
        pround(F.col("_kf"), 4).alias("kept_frac"),
        "doc_kept",
    )
