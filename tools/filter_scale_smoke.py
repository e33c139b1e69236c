#!/usr/bin/env python
"""Scale smoke for the quality-filtering / LM family: 100k synthetic
documents, no parquet in the way.

Generates word-salad documents with spark.range + format_string
(distributed, zero I/O, materialized once), then times the late-r7
filtering operators at their DEPLOYMENT shape — gopher_signals /
line_cleaning_stats over a ready lines array (real corpora arrive
multi-line; the registry queries' fixture rendering is test-only),
bigram-LM training + full-corpus perplexity scoring, and temperature
reweighting over 1000 domains. Prints one JSON line; numbers land in
SCALE.md.

Usage: python tools/filter_scale_smoke.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tower_parse_spark.functions import text as T  # noqa: E402
from tower_parse_spark.operators import classifier as CL  # noqa: E402
from tower_parse_spark.operators import lm as LM  # noqa: E402
from tower_parse_spark.operators import quality as Q  # noqa: E402
from tower_parse_spark.operators.sampling import temperature_weights  # noqa: E402
from tower_parse_spark.session import get_spark  # noqa: E402

TOKENS_PER_DOC = 60
LINE_WIDTH = 6
VOCAB = 1000
DOMAINS = 1000


def docs_df(spark, n: int):
    """n synthetic documents: 60 tokens from a 1000-word vocabulary via
    modular arithmetic (per-element lambda touches only the cheap `id`
    attribute — the HOF staging rule), a lines array (10 x 6-token
    lines, every 7th line bulleted, every 3rd terminal-punctuated), and
    a 1000-way domain key."""
    r = spark.range(0, n, 1, 64)
    d = F.col("id")
    word = lambda i: F.format_string(  # noqa: E731
        "w%04d", F.pmod(d * 31 + i * F.lit(17), F.lit(VOCAB)).cast("int")
    )
    toks = F.transform(F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)), word)
    staged = r.select(
        d.alias("doc_id"),
        F.format_string("d%03d", F.pmod(d, F.lit(DOMAINS)).cast("int")).alias(
            "source"
        ),
        toks.alias("_toks"),
    )
    line = lambda j: F.concat(  # noqa: E731
        F.when((F.col("doc_id") + j) % 7 == 0, F.lit("- ")).otherwise(F.lit("")),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), (j - 1) * LINE_WIDTH + 1, LINE_WIDTH)
        ),
        F.when((F.col("doc_id") + j) % 3 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    n_lines = TOKENS_PER_DOC // LINE_WIDTH
    return staged.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.col("_toks")).alias("text"),
        F.transform(F.sequence(F.lit(1), F.lit(n_lines)), line).alias("lines"),
    )


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("filter_scale_smoke")
    docs = docs_df(spark, n).localCheckpoint(eager=True)
    noop(docs)  # warm-up

    out = {"n_docs": n, "tokens_per_doc": TOKENS_PER_DOC}

    t = noop(Q.gopher_signals(docs))
    out["gopher_signals_s"] = t
    out["gopher_docs_per_s"] = round(n / t)

    t = noop(Q.line_cleaning_stats(docs))
    out["line_cleaning_s"] = t
    out["line_cleaning_docs_per_s"] = round(n / t)

    t0 = time.time()
    model = LM.train_bigram_lm(docs.filter(F.col("doc_id") % 10 == 0))
    lm = model.lm.localCheckpoint(eager=True)
    uni = model.uni.localCheckpoint(eager=True)
    unk = model.unk.localCheckpoint(eager=True)
    out["lm_train_s"] = round(time.time() - t0, 2)
    out["lm_bigrams"] = lm.count()

    model = LM.BigramLM(lm=lm, uni=uni, unk=unk)
    t = noop(LM.score_perplexity(docs, model))
    out["ppl_score_s"] = t
    out["ppl_docs_per_s"] = round(n / t)

    per = docs.groupBy("source").agg(
        F.sum(F.coalesce(F.size(T.tokens(F.col("text"))), F.lit(0))).alias(
            "n_tokens"
        )
    )
    t = noop(temperature_weights(per, size_col="n_tokens"))
    out["reweight_1000_domains_s"] = t

    # NB quality classifier (r8): train on a 20% labeled slice (half of
    # it spam-decorated), then score the full corpus — the weight table
    # is materialized once like a deployment would (the model is an
    # artifact, not a per-query subplan)
    t0 = time.time()
    spam = F.concat(
        F.col("text"), F.lit(" zzclicka zzbuyb zzfreec zzcasinod")
    )
    labeled = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.lit(True).alias("label"), F.col("text"))
        .unionAll(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                F.lit(False).alias("label"), spam.alias("text")
            )
        )
    )
    nb = CL.train_quality_nb(labeled)
    nb = CL.NBModel(
        weights=nb.weights.localCheckpoint(eager=True),
        consts=nb.consts.localCheckpoint(eager=True),
    )
    out["nb_train_s"] = round(time.time() - t0, 2)
    out["nb_weight_rows"] = nb.weights.count()
    t = noop(CL.score_quality(docs, nb))
    out["nb_score_s"] = t
    out["nb_docs_per_s"] = round(n / t)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
