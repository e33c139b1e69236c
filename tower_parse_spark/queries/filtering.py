"""Quality-filtering / mixture queries: Gopher rules, C4 line cleaning,
temperature domain reweighting, semantic decontamination, CCNet
perplexity scoring.

Late-round-7 surface. Same portability contract as queries/llm.py — every
DuckDB oracle is generated from the engine's own constants
(operators/quality.py thresholds, the shared lines fixture, the sign-LSH
lattice) so the two sides cannot drift, and every float aggregate is
pround-ed identically on both engines.

The raw ``documents`` fixture is single-line word salad, so the
line-level families run over a deterministic multi-line rendering
(:func:`_docs_with_lines`) — the established fixture-augmentation
pattern (cf. queries/curation.py::_docs_with_urls): each document is
re-wrapped into 6-token lines decorated with every pathology the rules
must handle (bullet lines, heading lines, ellipsis / terminal-punct
endings, injected boilerplate lines), keyed only on (doc_id, line_no)
so both engines synthesize byte-identical lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tower_parse_spark.functions import text as T
from tower_parse_spark.functions.rounding import pround, sql_pround
from tower_parse_spark.functions.vectors import SQL_NORM, sql_cosine
from tower_parse_spark.operators import classifier as CL
from tower_parse_spark.operators import decontam as DC
from tower_parse_spark.operators import lm as LM
from tower_parse_spark.operators import quality as Q
from tower_parse_spark.operators import sampling as SP
from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table

SQL_TOKS = T.SQL_TOKENS.format(x="text")

# --------------------------------------------------------------------------
# The shared multi-line document rendering
# --------------------------------------------------------------------------

#: injected boilerplate lines (each trips a different C4 marker)
BOILERPLATE_LINES = (
    "Please enable JavaScript and cookies to continue.",
    "lorem ipsum dolor sit amet",
    '{ "cookieConsent": true }',
)
#: tokens per rendered line
LINE_WIDTH = 6

#: per-doc pathological modes (doc_id % prime == residue) that push one
#: Gopher rule each over its threshold, so every rule demonstrably
#: fires somewhere in the corpus (the signals alone are hash-verified
#: regardless; the modes make the VERDICT column exercise all branches)
MODE_ELLIPSIS = (41, 5)  # "..." on every 3rd line -> ellipsis_frac > 0.3
MODE_BULLET = (43, 6)  # "- " on every line -> bullet_frac > 0.9
MODE_SYMBOL = (47, 8)  # "#### " on every line -> symbol ratio > 0.1
MODE_DIGITS = (53, 9)  # 4 digit words per line -> alpha_frac < 0.8


def _docs_with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rendered as an array of decorated lines.

    Line i (1-based) of doc d:
    - every 13th (d + 7i) slot: a boilerplate line (rotating through
      BOILERPLATE_LINES on (d + i) % 3),
    - otherwise tokens [6(i-1)+1 .. 6i] joined by spaces, with
      "- " bullet prefix when (d + i) % 7 = 0,
      "# " heading prefix when (d + i) % 17 = 4,
      "..." suffix when (3d + i) % 11 = 0, else "." when (d + i) % 3 = 0,
    - plus the per-doc pathological MODE_* decorations above.

    Pure row-local projection (sequence + transform — no explode, no
    shuffle); NULL/empty text renders as an EMPTY line array in both
    engines (the strict `size > 0` guard mirrors the oracle's
    `len(toks) > 0` CASE, which sends NULL to the ELSE branch too).

    The token array is STAGED as its own projection before the
    line-building lambda: referencing the tokenizer EXPRESSION inside
    the per-line `transform` would inline and re-run the full regexp
    tokenization once per line per consumer (the element_at/HOF-lambda
    pathology found on the perplexity bigram path, operators/lm.py::
    bigrams — staging cut gopher_quality/line_cleaning ~10x at sf0.1).
    """
    from tower_parse_spark.session import ensure_parallelism

    # the per-line transform lambdas are compute-bound row-local work;
    # the fixture scan is one split (r10 classifier precedent — no-op
    # at real scale)
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    staged = docs.select("doc_id", T.tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    d = F.col("doc_id")
    boiler = F.array(*[F.lit(b) for b in BOILERPLATE_LINES])

    def mk(i):
        base = F.concat_ws(
            " ", F.slice(toks, (i - 1) * LINE_WIDTH + 1, LINE_WIDTH)
        )
        base = F.when(
            d % MODE_DIGITS[0] == MODE_DIGITS[1],
            F.concat(base, F.lit(" 0 1 22 333")),
        ).otherwise(base)
        deco = F.concat(
            F.when((d + i) % 7 == 0, F.lit("- "))
            .when((d + i) % 17 == 4, F.lit("# "))
            .otherwise(F.lit("")),
            base,
            F.when(
                (d % MODE_ELLIPSIS[0] == MODE_ELLIPSIS[1]) & (i % 3 == 0),
                F.lit("..."),
            )
            .when((d * 3 + i) % 11 == 0, F.lit("..."))
            .when((d + i) % 3 == 0, F.lit("."))
            .otherwise(F.lit("")),
        )
        inner = F.when(
            (d + i * 7) % 13 == 0,
            F.element_at(boiler, ((d + i) % 3 + 1).cast("int")),
        ).otherwise(deco)
        return (
            F.when(
                d % MODE_BULLET[0] == MODE_BULLET[1],
                F.concat(F.lit("- "), inner),
            )
            .when(
                d % MODE_SYMBOL[0] == MODE_SYMBOL[1],
                F.concat(F.lit("#### "), inner),
            )
            .otherwise(inner)
        )

    n_lines = F.ceil(F.size(toks) / F.lit(float(LINE_WIDTH))).cast("int")
    lines = F.when(
        F.size(toks) > 0, F.transform(F.sequence(F.lit(1), n_lines), mk)
    ).otherwise(F.array().cast("array<string>"))
    return staged.select("doc_id", lines.alias("lines"))


def _sql_boiler_list() -> str:
    quoted = ", ".join("'" + b.replace("'", "''") + "'" for b in BOILERPLATE_LINES)
    return f"[{quoted}]"


#: the inner (pre-mode) line expression of the DuckDB twin, over lambda
#: var `i` in the `lined` CTE
_SQL_INNER_LINE = f"""
        CASE WHEN (doc_id + i * 7) % 13 = 0 THEN
          list_extract({_sql_boiler_list()}, CAST((doc_id + i) % 3 + 1 AS BIGINT))
        ELSE
          (CASE WHEN (doc_id + i) % 7 = 0 THEN '- '
                WHEN (doc_id + i) % 17 = 4 THEN '# '
                ELSE '' END) ||
          array_to_string(list_slice(toks, (i - 1) * {LINE_WIDTH} + 1, i * {LINE_WIDTH}), ' ') ||
          (CASE WHEN doc_id % {MODE_DIGITS[0]} = {MODE_DIGITS[1]} THEN ' 0 1 22 333' ELSE '' END) ||
          (CASE WHEN doc_id % {MODE_ELLIPSIS[0]} = {MODE_ELLIPSIS[1]} AND i % 3 = 0 THEN '...'
                WHEN (doc_id * 3 + i) % 11 = 0 THEN '...'
                WHEN (doc_id + i) % 3 = 0 THEN '.'
                ELSE '' END)
        END"""

#: the DuckDB twin of :func:`_docs_with_lines` — CTEs `tok` and `lined`
_LINES_SQL = f"""
tok AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents
), lined AS (
  SELECT doc_id,
    CASE WHEN len(toks) > 0 THEN
      list_transform(range(1, CAST(ceil(len(toks) / {float(LINE_WIDTH)}) AS BIGINT) + 1), i ->
        CASE WHEN doc_id % {MODE_BULLET[0]} = {MODE_BULLET[1]} THEN '- ' || ({_SQL_INNER_LINE})
             WHEN doc_id % {MODE_SYMBOL[0]} = {MODE_SYMBOL[1]} THEN '#### ' || ({_SQL_INNER_LINE})
             ELSE ({_SQL_INNER_LINE})
        END)
    ELSE CAST([] AS VARCHAR[]) END AS lines
  FROM tok
)
"""


# --------------------------------------------------------------------------
# Gopher quality rules
# --------------------------------------------------------------------------


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule report (Rae et al. 2021) over the rendered
    multi-line documents: per-doc signals + first-failing-rule verdict
    (operators/quality.py::gopher_signals — one scan projection, zero
    shuffles before the final sort)."""
    return Q.gopher_signals(_docs_with_lines(spark, sf_dir)).orderBy("doc_id")


_SQL_RTOKS = T.SQL_TOKENS.format(x="rendered")

GOPHER_QUALITY_ORACLE = f"""
WITH {_LINES_SQL},
rend AS (
  -- DuckDB's array_to_string([]) is NULL where Spark's array_join is ''
  -- — coalesce so zero-line docs tokenize to [] (n_words 0), not NULL
  SELECT doc_id, lines,
         coalesce(array_to_string(lines, chr(10)), '') AS rendered
  FROM lined
), rt AS (
  SELECT doc_id, lines, rendered, {_SQL_RTOKS} AS rtoks FROM rend
), sig AS (
  SELECT doc_id,
    len(lines) AS n_lines,
    len(rtoks) AS n_words,
    CASE WHEN len(rtoks) > 0
         THEN length(array_to_string(rtoks, '')) / CAST(len(rtoks) AS DOUBLE)
         ELSE 0.0 END AS mean_wl,
    CASE WHEN len(rtoks) > 0
         THEN (CAST((length(rendered) - length(regexp_replace(rendered, '#', '', 'g'))) AS BIGINT)
               + CAST((length(rendered) - length(regexp_replace(rendered, '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT))
              / CAST(len(rtoks) AS DOUBLE)
         ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, x -> starts_with(x, '- '))) / CAST(len(lines) AS DOUBLE)
         ELSE 0.0 END AS bullet_frac,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, x -> ends_with(x, '...'))) / CAST(len(lines) AS DOUBLE)
         ELSE 0.0 END AS ellipsis_frac,
    CASE WHEN len(rtoks) > 0
         THEN len(list_filter(rtoks, w -> regexp_matches(w, '[a-z]'))) / CAST(len(rtoks) AS DOUBLE)
         ELSE 0.0 END AS alpha_frac,
    {T.sql_wordlist_hits("rtoks", Q.GOPHER_REQUIRED_STOPWORDS)} AS stop_hits
  FROM rt
), verdict AS (
  SELECT *,
    -- fail-closed malformed rule mirrored from gopher_signals: the
    -- lined CTE never yields NULL here (the len(toks) guard), so this
    -- branch is dormant in the oracle, but the CASE must match the
    -- Spark verdict expression branch-for-branch
    CASE WHEN n_lines IS NULL OR n_words IS NULL THEN 'malformed'
         WHEN n_words < {Q.GOPHER_MIN_WORDS} OR n_words > {Q.GOPHER_MAX_WORDS} THEN 'words'
         WHEN mean_wl < {Q.GOPHER_MIN_MEAN_WORD_LEN} OR mean_wl > {Q.GOPHER_MAX_MEAN_WORD_LEN} THEN 'word_len'
         WHEN symbol_ratio > {Q.GOPHER_MAX_SYMBOL_RATIO} THEN 'symbol_ratio'
         WHEN bullet_frac > {Q.GOPHER_MAX_BULLET_FRAC} THEN 'bullet'
         WHEN ellipsis_frac > {Q.GOPHER_MAX_ELLIPSIS_FRAC} THEN 'ellipsis'
         WHEN alpha_frac < {Q.GOPHER_MIN_ALPHA_FRAC} THEN 'alpha'
         WHEN stop_hits < {Q.GOPHER_MIN_STOP_HITS} THEN 'stopwords'
         ELSE 'pass' END AS fail_reason
  FROM sig
)
SELECT doc_id,
       CAST(n_lines AS INT) AS n_lines,
       CAST(n_words AS INT) AS n_words,
       {sql_pround("mean_wl", 4)} AS mean_word_len,
       {sql_pround("symbol_ratio", 4)} AS symbol_ratio,
       {sql_pround("bullet_frac", 4)} AS bullet_frac,
       {sql_pround("ellipsis_frac", 4)} AS ellipsis_frac,
       {sql_pround("alpha_frac", 4)} AS alpha_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       fail_reason,
       fail_reason = 'pass' AS passes
FROM verdict
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# C4 line cleaning
# --------------------------------------------------------------------------


def line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning report over the rendered documents
    (operators/quality.py::line_cleaning_stats): per-doc lines
    in/kept/dropped, surviving chars, document keep verdict. One scan
    projection, zero shuffles before the final sort."""
    return Q.line_cleaning_stats(_docs_with_lines(spark, sf_dir)).orderBy(
        "doc_id"
    )


def _sql_line_kept(var: str) -> str:
    """DuckDB twin of operators/quality.py::_line_kept for lambda var *var*."""
    toks = T.SQL_TOKENS.format(x=var)
    terms = [f"len({toks}) >= {Q.C4_MIN_LINE_WORDS}"]
    chars = ", ".join("'" + c.replace("'", "''") + "'" for c in Q.C4_TERMINAL_CHARS)
    terms.append(f"substr({var}, -1, 1) IN ({chars})")
    for s in Q.C4_BAD_SUBSTRINGS:
        terms.append(f"NOT contains(lower({var}), '{s}')")
    return " AND ".join(terms)


LINE_CLEANING_ORACLE = f"""
WITH {_LINES_SQL},
cleaned AS (
  SELECT doc_id, lines,
         list_filter(lines, x -> {_sql_line_kept("x")}) AS kept
  FROM lined
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(len(lines) - len(kept) AS INT) AS n_dropped,
       -- DuckDB's array_to_string([]) is NULL where Spark's array_join
       -- is '' — coalesce to keep the zero-survivor rows at 0 chars
       CAST(coalesce(length(array_to_string(kept, chr(10))), 0) AS INT) AS kept_chars,
       {sql_pround(
           "CASE WHEN len(lines) > 0"
           " THEN len(kept) / CAST(len(lines) AS DOUBLE) ELSE 0.0 END", 4)}
         AS kept_frac,
       len(kept) >= {Q.C4_MIN_KEPT_LINES} AS doc_kept
FROM cleaned
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Temperature domain reweighting
# --------------------------------------------------------------------------


def domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static domain-mixture reweighting: per-source token shares ->
    alpha=0.5 temperature weights -> per-domain downsampling rates
    (operators/sampling.py::temperature_weights). The per-domain sizes
    come from ONE scan + one map-side-combinable agg; the two global
    reductions are one-row broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # NULL text counts 0 tokens (not NULL) so an all-NULL domain
        # lands at share 0.0 instead of a NULL-propagating row
        F.sum(F.coalesce(F.size(T.tokens(F.col("text"))), F.lit(0))).alias(
            "n_tokens"
        ),
    )
    w = SP.temperature_weights(per, stratum_col="source", size_col="n_tokens")
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        pround(F.col("share"), 6).alias("share"),
        pround(F.col("weight"), 6).alias("weight"),
        pround(F.col("sampling_rate"), 6).alias("sampling_rate"),
    ).orderBy("source")


DOMAIN_REWEIGHT_ORACLE = f"""
WITH tok AS (
  SELECT source, {SQL_TOKS} AS toks FROM documents
), per AS (
  SELECT source, count(*) AS n_docs,
         sum(coalesce(len(toks), 0)) AS n_tokens
  FROM tok GROUP BY source
), tot AS (
  SELECT sum(n_tokens) AS tot_tokens FROM per
), j AS (
  SELECT p.source, p.n_docs, p.n_tokens,
         CASE WHEN t.tot_tokens > 0
              THEN p.n_tokens / CAST(t.tot_tokens AS DOUBLE)
              ELSE 0.0 END AS share
  FROM per p CROSS JOIN tot t
), j2 AS (
  SELECT *,
         CAST(floor(sqrt(share) * {SP.WEIGHT_SCALE} + 0.5) AS BIGINT) AS wq,
         CASE WHEN share > 0
              THEN (CAST(floor(sqrt(share) * {SP.WEIGHT_SCALE} + 0.5) AS BIGINT)
                    / {float(SP.WEIGHT_SCALE)}) / share
              ELSE 0.0 END AS rate_raw
  FROM j
), g AS (
  SELECT sum(wq) AS wsum, max(rate_raw) AS rmax FROM j2
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       {sql_pround("share", 6)} AS share,
       {sql_pround(
           "CASE WHEN wsum > 0 THEN wq / CAST(wsum AS DOUBLE) ELSE 0.0 END", 6)}
         AS weight,
       {sql_pround(
           "CASE WHEN rmax > 0 THEN rate_raw / rmax ELSE 0.0 END", 6)}
         AS sampling_rate
FROM j2 CROSS JOIN g
ORDER BY source
"""


# --------------------------------------------------------------------------
# Semantic decontamination
# --------------------------------------------------------------------------

SEMANTIC_DECONTAM_THRESHOLD = 0.95
#: eval-set fixture: every (vec_id % 10 = 7) embedding, lightly
#: perturbed so the cosine to its origin stays near 1
_EVAL_ID_OFFSET = 2_000_000


def _eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized benchmark/eval embeddings: a 10% slice of the corpus,
    deterministically perturbed (scale x0.8 + small index-keyed additive
    term — cosine to the origin vector stays ~0.99+). The fixture
    carries no eval table, so one is derived the same way the
    near-copies dedup fixture is (queries/llm.py::_emb_with_near_copies,
    different constants so the two sets are distinct)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") % 10 == 7).select(
        (F.col("vec_id") + F.lit(_EVAL_ID_OFFSET)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double") * 0.8 + 0.015 * (i % 4).cast("double"),
        ).alias("embedding"),
    )


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-similarity decontamination of the corpus against the
    synthesized eval set (operators/decontam.py::
    flag_contaminated_semantic): sign-LSH-blocked broadcast join, corpus
    never shuffled; planted eval vectors flag their origin corpus rows,
    unrelated corpus rows pass (random pairwise cos < the threshold)."""
    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return DC.flag_contaminated_semantic(
        corpus,
        _eval_embeddings(spark, sf_dir),
        threshold=SEMANTIC_DECONTAM_THRESHOLD,
    ).orderBy("vec_id")


def _semantic_decontam_oracle() -> str:
    from tower_parse_spark.queries.llm import _sql_lsh_bucket

    cos = sql_cosine("c.embedding", "e.embedding")
    return f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
), ev AS (
  SELECT vec_id + {_EVAL_ID_OFFSET} AS vec_id,
         list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
                        p -> CAST(p[1] AS DOUBLE) * 0.8 + 0.015 * ((p[2] - 1) % 4))
           AS embedding
  FROM embeddings WHERE vec_id % 10 = 7
), cb AS (
  SELECT vec_id, embedding, {_sql_lsh_bucket()} AS blk,
         {SQL_NORM.format(a="embedding")} AS nv
  FROM corpus
), eb AS (
  SELECT vec_id, embedding, {_sql_lsh_bucket()} AS blk,
         {SQL_NORM.format(a="embedding")} AS nv
  FROM ev
), cand AS (
  SELECT c.vec_id AS cid, {sql_pround(cos, 4)} AS cos_r
  FROM cb c JOIN eb e USING (blk)
  WHERE c.nv > 0 AND e.nv > 0
), hits AS (
  SELECT cid, count(*) AS n_eval_matches, max(cos_r) AS max_cos
  FROM cand WHERE cos_r >= {SEMANTIC_DECONTAM_THRESHOLD}
  GROUP BY cid
)
SELECT c.vec_id,
       CAST(coalesce(h.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       coalesce(h.max_cos, 0.0) AS max_cos,
       coalesce(h.n_eval_matches, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h ON c.vec_id = h.cid
ORDER BY c.vec_id
"""


# --------------------------------------------------------------------------
# CCNet-style perplexity filter
# --------------------------------------------------------------------------

#: reference-corpus slice: every 5th document plays "Wikipedia" — the
#: clean corpus CCNet trains its scoring LM on
PPL_REF_MOD = 5
#: planted out-of-vocabulary docs (id + PPL_UNK_OFFSET for doc_id %
#: PPL_UNK_MOD = PPL_UNK_RES): three words no fixture tokenizer output
#: contains, prepended to the original text, so the UNKNOWN-first-word
#: penalty path demonstrably fires in the oracle-checked distribution
#: (the fixture vocabulary is fully covered by the 20% reference slice,
#: so without planting n_unk would be 0 everywhere — same rationale as
#: the Gopher pathological modes above)
#: both offsets assume raw fixture ids stay strictly below them — the
#: oracles split raw-vs-planted rows with `id < offset` predicates over
#: the augmented union. tests/test_fixture_contract.py::
#: test_fixture_ids_below_synthesis_offsets pins the headroom at every
#: on-disk sf (ADVICE r7).
PPL_UNK_OFFSET = 4_000_000
PPL_UNK_MOD, PPL_UNK_RES = 97, 3
PPL_UNK_WORDS = "zzqunka zzqunkb zzqunkc"


def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style model-based quality scoring (operators/lm.py): a
    Laplace bigram LM is trained on the reference slice (doc_id %
    PPL_REF_MOD = 0 of the RAW corpus), then every document — plus the
    planted out-of-vocabulary copies — is scored by integer-quantized
    cross-entropy and bucketed head/middle/tail. LM tables broadcast,
    corpus never shuffled for the joins; one map-side-combinable
    per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.filter(d % PPL_UNK_MOD == PPL_UNK_RES).select(
        (d + PPL_UNK_OFFSET).alias("doc_id"),
        F.concat(
            F.lit(PPL_UNK_WORDS + " "), F.coalesce(F.col("text"), F.lit(""))
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionAll(planted)
    model = LM.train_bigram_lm(docs.filter(d % PPL_REF_MOD == 0))
    out = LM.score_perplexity(corpus, model)
    return out.select(
        "doc_id",
        "n_bigrams",
        "n_known",
        "n_backoff",
        "n_unk",
        pround(F.col("cross_entropy"), 4).alias("cross_entropy"),
        "ppl_bucket",
    ).orderBy("doc_id")


#: DuckDB twin of operators/lm.py::bigrams — range() is end-exclusive
#: where Spark's sequence() is inclusive, so range(1, len) matches
#: sequence(1, len - 1)
_SQL_BIGRAMS = (
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
)

_SQL_CE_RAW = (
    "CASE WHEN coalesce(p.n_bigrams, 0) > 0"
    f" THEN (CAST(p.sq AS BIGINT) / {float(LM.NLL_SCALE)}) / p.n_bigrams"
    " ELSE 0.0 END"
)

PERPLEXITY_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PPL_UNK_OFFSET} AS doc_id,
         '{PPL_UNK_WORDS} ' || coalesce(text, '') AS text
  FROM documents WHERE doc_id % {PPL_UNK_MOD} = {PPL_UNK_RES}
), tok AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM aug
), ref AS (
  -- the LM trains on the RAW corpus slice only: planted ids can be
  -- divisible by {PPL_REF_MOD} too (the offset is a multiple), so the
  -- < offset guard keeps the out-of-vocabulary words out of the model
  SELECT doc_id, toks FROM tok
  WHERE doc_id % {PPL_REF_MOD} = 0 AND doc_id < {PPL_UNK_OFFSET}
), uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM ref) GROUP BY w1
), v AS (
  SELECT count(*) AS vv FROM uni
), refbg AS (
  SELECT unnest({_SQL_BIGRAMS}) AS bg FROM ref WHERE len(toks) >= 2
), bi AS (
  SELECT bg, count(*) AS c2 FROM refbg GROUP BY bg
), lm AS (
  SELECT bg,
         CAST(floor(ln((c1 + vv) / (c2 + 1.0)) * {LM.NLL_SCALE} + 0.5) AS BIGINT) AS nll_q
  FROM bi JOIN uni ON split_part(bg, ' ', 1) = w1 CROSS JOIN v
), uq AS (
  SELECT w1,
         CAST(floor(ln((c1 + vv) / 1.0) * {LM.NLL_SCALE} + 0.5) AS BIGINT) AS nll1_q
  FROM uni CROSS JOIN v
), unk AS (
  SELECT CAST(floor(ln(vv / 1.0) * {LM.NLL_SCALE} + 0.5) AS BIGINT) AS nll_unk_q
  FROM v
), docbg AS (
  SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bg FROM tok WHERE len(toks) >= 2
), sc AS (
  SELECT d.doc_id,
         coalesce(l.nll_q, u.nll1_q, k.nll_unk_q) AS q,
         l.nll_q IS NOT NULL AS known,
         l.nll_q IS NULL AND u.nll1_q IS NOT NULL AS backoff
  FROM docbg d
  LEFT JOIN lm l ON d.bg = l.bg
  LEFT JOIN uq u ON split_part(d.bg, ' ', 1) = u.w1
  CROSS JOIN unk k
), per AS (
  SELECT doc_id, count(*) AS n_bigrams,
         sum(CASE WHEN known THEN 1 ELSE 0 END) AS n_known,
         sum(CASE WHEN backoff THEN 1 ELSE 0 END) AS n_backoff,
         sum(q) AS sq
  FROM sc GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(p.n_known, 0) AS BIGINT) AS n_known,
       CAST(coalesce(p.n_backoff, 0) AS BIGINT) AS n_backoff,
       CAST(coalesce(p.n_bigrams, 0) - coalesce(p.n_known, 0)
            - coalesce(p.n_backoff, 0) AS BIGINT) AS n_unk,
       {sql_pround(_SQL_CE_RAW, 4)} AS cross_entropy,
       CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 'empty'
            WHEN {_SQL_CE_RAW} <= {LM.CE_HEAD} THEN 'head'
            WHEN {_SQL_CE_RAW} <= {LM.CE_MIDDLE} THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM tok t LEFT JOIN per p ON t.doc_id = p.doc_id
ORDER BY t.doc_id
"""


# --------------------------------------------------------------------------
# Model-based quality classifier (hashed-feature Naive Bayes)
# --------------------------------------------------------------------------

#: labeled-slice fixture: doc_id % 5 == 0 plays the clean/positive class
#: (same residue the CCNet LM's reference slice uses — the "Wikipedia"
#: role), doc_id % 5 == 1 plays the junk/negative class with a spam
#: suffix appended so the negative vocabulary is demonstrably distinct
QC_POS_RES, QC_NEG_RES = 0, 1
QC_LABEL_MOD = 5
#: deterministic low-quality decoration — tokens no fixture tokenizer
#: output contains, so their feature buckets are pure-negative evidence
QC_SPAM_WORDS = "zzclicka zzbuyb zzfreec zzcasinod zzwinnere zzbonusf"
#: planted junk copies in the SCORED corpus (doc_id + offset for
#: doc_id % QC_SPAM_MOD == QC_SPAM_RES) — the verdict's negative branch
#: demonstrably fires in the oracle-checked distribution (the planting
#: rationale of PPL_UNK_OFFSET above; the offset headroom is pinned by
#: tests/test_fixture_contract.py)
QC_SPAM_OFFSET = 8_000_000
QC_SPAM_MOD, QC_SPAM_RES = 11, 4


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality classification (operators/classifier.py): a
    hashed bag-of-words Naive Bayes model is trained in closed form on
    the labeled slices (two aggregations), then every document — plus
    the planted junk copies — is scored by an integer-quantized log-odds
    sum and given a boolean quality verdict. Weight table broadcast
    (bounded at N_FEATURES by construction), corpus shuffled once (the
    per-doc aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    text = F.coalesce(F.col("text"), F.lit(""))
    spam = F.concat(text, F.lit(" " + QC_SPAM_WORDS))
    labeled = (
        docs.filter(d % QC_LABEL_MOD == QC_POS_RES)
        .select(F.lit(True).alias("label"), F.col("text"))
        .unionAll(
            docs.filter(d % QC_LABEL_MOD == QC_NEG_RES).select(
                F.lit(False).alias("label"), spam.alias("text")
            )
        )
    )
    planted = docs.filter(d % QC_SPAM_MOD == QC_SPAM_RES).select(
        (d + QC_SPAM_OFFSET).alias("doc_id"), spam.alias("text")
    )
    corpus = docs.select("doc_id", "text").unionAll(planted)
    model = CL.train_quality_nb(labeled)
    return CL.score_quality(corpus, model).orderBy("doc_id")


def _quality_classifier_oracle() -> str:
    from tower_parse_spark.operators.classifier import (
        N_FEATURES,
        W_SCALE,
        sql_feature_bucket,
    )

    b = float(N_FEATURES)
    quant = "CAST(floor(ln({x}) * {s} + 0.5) AS BIGINT)"

    def q(x: str) -> str:
        return quant.format(x=x, s=W_SCALE)

    return f"""
WITH lab AS (
  SELECT TRUE AS pos, text FROM documents WHERE doc_id % {QC_LABEL_MOD} = {QC_POS_RES}
  UNION ALL
  SELECT FALSE AS pos, coalesce(text, '') || ' {QC_SPAM_WORDS}' AS text
  FROM documents WHERE doc_id % {QC_LABEL_MOD} = {QC_NEG_RES}
), labtok AS (
  SELECT pos, {SQL_TOKS} AS toks FROM lab
), tok_exploded AS (
  SELECT pos, unnest(toks) AS tok FROM labtok
), pb AS (
  SELECT {sql_feature_bucket("tok")} AS bucket,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS n_neg
  FROM tok_exploded GROUP BY 1
), tot AS (
  SELECT sum(CASE WHEN pos THEN coalesce(len(toks), 0) ELSE 0 END) AS tot_pos,
         sum(CASE WHEN NOT pos THEN coalesce(len(toks), 0) ELSE 0 END) AS tot_neg,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS docs_pos,
         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS docs_neg
  FROM labtok
), w AS (
  SELECT bucket,
         {q(f"(n_pos + 1.0) / (tot_pos + {b})")}
         - {q(f"(n_neg + 1.0) / (tot_neg + {b})")} AS w_q
  FROM pb CROSS JOIN tot
), consts AS (
  SELECT {q(f"1.0 / (tot_pos + {b})")} - {q(f"1.0 / (tot_neg + {b})")} AS w0_q,
         {q("docs_pos / CAST(docs_neg AS DOUBLE)")} AS prior_q
  FROM tot
), aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {QC_SPAM_OFFSET} AS doc_id,
         coalesce(text, '') || ' {QC_SPAM_WORDS}' AS text
  FROM documents WHERE doc_id % {QC_SPAM_MOD} = {QC_SPAM_RES}
), doctok AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM aug
), sc AS (
  SELECT d.doc_id, w.w_q
  FROM doctok d LEFT JOIN w ON {sql_feature_bucket("d.tok")} = w.bucket
), per AS (
  SELECT doc_id, count(*) AS n_tokens, sum(w_q) AS w_sum,
         sum(CASE WHEN w_q IS NULL THEN 1 ELSE 0 END) AS n_unseen
  FROM sc GROUP BY doc_id
), scored AS (
  SELECT a.doc_id,
         CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(c.prior_q + coalesce(p.w_sum, 0)
              + coalesce(p.n_unseen, 0) * c.w0_q AS BIGINT) AS score_q
  FROM aug a LEFT JOIN per p ON a.doc_id = p.doc_id CROSS JOIN consts c
)
SELECT doc_id, n_tokens, score_q,
       {sql_pround(f"score_q / {float(W_SCALE)}", 4)} AS log_odds,
       score_q > 0 AS is_quality
FROM scored
ORDER BY doc_id
"""


QUERIES = {
    "gopher_quality": Query(
        gopher_quality,
        GOPHER_QUALITY_ORACLE,
        "Gopher quality rules: signals + first-failing-rule verdict",
    ),
    "line_cleaning": Query(
        line_cleaning,
        LINE_CLEANING_ORACLE,
        "C4 line-level cleaning: kept lines/chars + doc keep verdict",
    ),
    "domain_reweight": Query(
        domain_reweight,
        DOMAIN_REWEIGHT_ORACLE,
        "temperature (alpha=0.5) domain mixture weights + sampling rates",
    ),
    "decontaminate_semantic": Query(
        decontaminate_semantic,
        _semantic_decontam_oracle(),
        "embedding-cosine decontamination vs synthesized eval set",
    ),
    "perplexity_filter": Query(
        perplexity_filter,
        PERPLEXITY_ORACLE,
        "CCNet bigram-LM cross-entropy scoring + head/middle/tail buckets",
    ),
    "quality_classifier": Query(
        quality_classifier,
        _quality_classifier_oracle(),
        "hashed-feature Naive Bayes quality scoring + boolean verdict",
    ),
}
