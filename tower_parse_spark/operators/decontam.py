"""Test-set decontamination for training-data pipelines.

Flags training documents that share any word n-gram with a benchmark /
held-out set — the standard guard against benchmark leakage when
assembling LLM training corpora (the "13-gram overlap" filter of the
GPT-3 appendix, the n-gram decontamination step in The Pile / Dolma;
all public methodology).

Scale design (100 TB corpus, benchmark ≪ corpus — the realistic shape):

- n-gram hashing happens inside the row projection (one md5 per TOKEN,
  polynomial combine into n-gram hashes — same staged machinery as
  MinHash, operators/dedup.py), no UDF, whole-stage codegen.
- The benchmark side collapses to a DISTINCT relation of gram hashes:
  ``|benchmark| × grams/doc`` longs — a few million rows for any real
  eval suite — and is explicitly broadcast.
- The corpus side explodes to (id, gram) and hits the broadcast set with
  a **broadcast semi-ish inner join**: the corpus is never shuffled; the
  only shuffle is the per-doc match count over the (tiny) matching rows.
- The final flag join-back of the match-count relation onto the corpus
  carries NO hint: |hits| is bounded only by the number of contaminated
  docs, which is unbounded in the worst case, so the decision is left
  to AQE — it broadcasts at runtime when the relation is in fact small
  (the common case) and falls back to a shuffle join when it is not.

So: zero corpus shuffles, one forced broadcast, one small-aggregate shuffle —
the plan survives a 1000-executor scan. Reference context: the reference
has no corpus tooling at all (it stops at ingest, readport.py:1-50);
this family is part of the BASELINE.json extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tower_parse_spark.functions.text import (
    HASH_P,
    combine_shingle_hashes,
    token_hash,
    tokens,
)
from tower_parse_spark.session import ensure_parallelism

#: default n-gram width for contamination checks. Real pipelines use
#: 8-13 (GPT-3: 13); the oracle query drops to 3 because the synthetic
#: documents table has a ~30-word vocabulary and ~30-token docs, so
#: wider grams almost never collide and the query would test an empty
#: join.
DECONTAM_N = 8


def ngram_hash_set(df: DataFrame, text_col: str = "text", n: int = DECONTAM_N) -> DataFrame:
    """Append ``_grams``: the DISTINCT word-n-gram hashes of *text_col*.

    Staged projection (token md5 -> mod-P token hashes -> polynomial
    n-gram combine -> array_distinct), identical hashing family to the
    MinHash pipeline so the two share one pass when composed.
    """
    toks = tokens(F.col(text_col))
    return (
        df.withColumn("_th", F.transform(toks, lambda t: token_hash(t) % HASH_P))
        .withColumn(
            "_grams",
            F.array_distinct(combine_shingle_hashes(F.col("_th"), n)),
        )
        .drop("_th")
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
) -> DataFrame:
    """Per-corpus-document contamination flag against *benchmark*.

    Returns the corpus ids with ``n_shared_grams`` (how many distinct
    n-gram hashes of the document also occur anywhere in the benchmark)
    and ``contaminated`` (any overlap). Documents shorter than *n*
    tokens have zero grams and are never flagged.
    """
    # explode_outer, not explode: for a plain explode the optimizer
    # (InferFiltersFromGenerate) synthesizes `size(_grams) > 0` and
    # predicate pushdown rebuilds that filter BELOW the staged _th/_grams
    # projections, inlining the md5 token-hash transform at every
    # element_at site — measured 33x slower at sf0.1 (110 s -> 3.2 s).
    # The rule skips outer generates; filtering the generated attribute
    # afterwards is cheap and cannot be pushed past the Generate.
    bench_grams = (
        ngram_hash_set(benchmark, text_col, n)
        .select(F.explode_outer("_grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    corpus_grams = (
        ensure_parallelism(ngram_hash_set(corpus, text_col, n))
        .select(F.col(id_col), F.explode_outer("_grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    # join-back carries NO broadcast hint: |hits| scales with the number
    # of contaminated corpus rows, which is unbounded — a heavily
    # contaminated corpus would blow a forced broadcast. AQE promotes it
    # to broadcast at runtime when it IS small (the common case); only
    # the benchmark side is hinted.
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_grams"), F.lit(0).cast("long")).alias(
                "n_shared_grams"
            ),
            (F.coalesce(F.col("n_shared_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


#: minimum estimated Jaccard (fraction of matching MinHash slots) for a
#: corpus doc to count as a fuzzy match of a benchmark doc. 0.5 = 8 of
#: 16 slots — exact binary fractions, so the threshold compare is
#: engine-portable.
FUZZY_THRESHOLD = 0.5


def flag_contaminated_fuzzy(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = FUZZY_THRESHOLD,
    hash_fn: str = "portable",
) -> DataFrame:
    """NEAR-duplicate decontamination: flag corpus documents whose MinHash
    signature agrees with some benchmark document's on >= *threshold* of
    its slots (estimated Jaccard) — catches lightly-reworded benchmark
    leakage the exact n-gram filter misses (the fuzzy-dedup
    decontamination step of Llama/Dolma-style pipelines; public
    methodology, Broder resemblance sketches + banded LSH).

    Scale shape (benchmark ≪ corpus): both sides project signatures in
    the row scan; the BENCHMARK banding (|bench| × bands rows of
    (band_key, id, 16 longs)) is explicitly broadcast, so the corpus is
    NEVER shuffled — candidate generation is a broadcast hash join on the
    band key, exactly the decontamination asymmetry that makes this
    cheaper than the self-join dedup: per-corpus-row work is bands probes
    of a hash map. The only shuffle is the per-doc aggregate over
    surviving candidates.

    Returns every corpus id with ``n_bench_matches`` (benchmark docs at
    or above the threshold), ``max_est_jaccard`` (0.0 when unmatched),
    and ``contaminated``.
    """
    # shared banding + scorer (operators/dedup.py): the checkpoint-then-
    # filter order inside banded_signatures stops pushdown re-inlining
    # the K-fold signature into the filter, and stops BHJ codegen
    # re-running the fold per matched pair on the streamed side
    from tower_parse_spark.operators.dedup import (
        banded_signatures,
        est_jaccard,
    )

    cand = (
        banded_signatures(corpus, id_col=id_col, text_col=text_col, hash_fn=hash_fn)
        .withColumnsRenamed({id_col: "cid", "mh": "mh1"})
        .join(
            F.broadcast(
                banded_signatures(
                    benchmark, id_col=id_col, text_col=text_col, hash_fn=hash_fn
                ).withColumnsRenamed({id_col: "bid", "mh": "mh2"})
            ),
            "band_key",
        )
        # est scored + thresholded BEFORE the (cid, bid) dedup (r16,
        # guide §2.3, same commutation as the incremental probe in
        # operators/dedup.py: est is functional on the pair, so every
        # band-duplicate scores identically and the kept set is
        # unchanged). The dedup — the probe's ONE corpus-sized shuffle —
        # then carries (cid, bid, est double) for threshold-passing pairs
        # only, instead of two K-long signature arrays for every
        # band-collision candidate.
        .select(
            "cid",
            "bid",
            est_jaccard(F.col("mh1"), F.col("mh2")).alias("est"),
        )
        .filter(F.col("est") >= threshold)
        .dropDuplicates(["cid", "bid"])
    )
    hits = (
        cand.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_bench_matches"),
            F.max("est").alias("max_est"),
        )
    )
    # unhinted join-back (unbounded |hits| — see flag_contaminated_ngram)
    return (
        corpus.select(id_col)
        .join(hits.withColumnRenamed("cid", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bench_matches"), F.lit(0).cast("long")).alias(
                "n_bench_matches"
            ),
            F.round(F.coalesce(F.col("max_est"), F.lit(0.0)), 4).alias(
                "max_est_jaccard"
            ),
            (F.coalesce(F.col("n_bench_matches"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def flag_contaminated_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    planes: int = 6,
) -> DataFrame:
    """SEMANTIC decontamination: flag corpus items whose embedding is
    cosine-similar (>= *threshold*) to some benchmark/eval item —
    catches paraphrased benchmark leakage that survives both the exact
    n-gram filter and the MinHash fuzzy filter (the embedding-similarity
    decontamination pass of recent open-data pipelines; public
    methodology — same signal family as SemDeDup, Abbas et al. 2023,
    pointed at a held-out set instead of the corpus itself).

    Scale shape (benchmark ≪ corpus, the decontamination asymmetry):
    both sides are blocked by the seedless sign-LSH hyperplane lattice
    (operators/similarity.py::bucket_expr — the same blocking the
    embedding near-dup dedup uses, same documented recall tradeoff);
    the BENCHMARK side (|bench| rows of (bucket, id, vector)) is
    explicitly broadcast, so candidate generation is a broadcast hash
    join on the bucket key and the corpus is NEVER shuffled. Per-row
    work is (matching bench vectors) x one fused dot product. The only
    shuffles are the per-id aggregate over surviving candidates and the
    verdict join-back — the same two-shuffle tail as
    :func:`flag_contaminated_fuzzy`.

    Cosines are compared at pround(4) (both engines round identically,
    functions/rounding.py) so the threshold can never split on
    last-bit float drift. Zero-norm / NULL vectors never match (nv > 0
    guard) but still receive a verdict row via the left join.
    """
    from tower_parse_spark.functions import vectors as V
    from tower_parse_spark.functions.rounding import pround
    from tower_parse_spark.operators.similarity import bucket_expr

    def blocked(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        v = V.as_double(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(out_id),
            v.alias(out_vec),
            bucket_expr(v, dim, planes).alias("blk"),
            V.norm(v).alias(f"_nv_{out_id}"),
        )

    cand = (
        blocked(corpus, "cid", "cvec")
        .join(F.broadcast(blocked(benchmark, "bid", "bvec")), "blk")
        .filter((F.col("_nv_cid") > 0) & (F.col("_nv_bid") > 0))
        .withColumn(
            "cos_r",
            pround(
                V.dot(F.col("cvec"), F.col("bvec"))
                / (F.col("_nv_cid") * F.col("_nv_bid")),
                4,
            ),
        )
        .filter(F.col("cos_r") >= threshold)
        # no dedup needed: each vector lands in exactly ONE bucket
        # (bucket_expr is single-probe), so a (cid, bid) pair can only
        # arise once — adding dropDuplicates here would be a pure extra
        # shuffle over the candidate relation
    )
    hits = cand.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("cos_r").alias("max_cos"),
    )
    # unhinted join-back (unbounded |hits| — see flag_contaminated_ngram)
    return (
        corpus.select(F.col(id_col))
        .join(hits.withColumnRenamed("cid", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_eval_matches"), F.lit(0).cast("long")).alias(
                "n_eval_matches"
            ),
            F.coalesce(F.col("max_cos"), F.lit(0.0)).alias("max_cos"),
            (F.coalesce(F.col("n_eval_matches"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
