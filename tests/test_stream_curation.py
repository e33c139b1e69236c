"""Composed streaming curation pipeline (streaming/curation.py):
quality gate -> near-dup gate -> accepted/rejected sinks, exactly-once
per epoch."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from tower_parse_spark.operators.classifier import (
    NBModel,
    load_quality_model,
    save_quality_model,
    score_quality,
    train_quality_nb,
)
from tower_parse_spark.streaming import curation as CU

CLEAN_A = "the committee published the annual report with detailed findings"
CLEAN_B = "markets closed higher after the quarterly earnings beat forecasts"
CLEAN_C = "researchers described a new method for measuring ocean currents"
SPAM = "zzclicka zzbuyb zzfreec zzcasinod zzwinnere zzbonusf"


def _model(spark):
    rows = [(True, CLEAN_A), (True, CLEAN_B), (True, CLEAN_C)] + [
        (False, f"{SPAM} extra{i}") for i in range(3)
    ]
    return train_quality_nb(
        spark.createDataFrame(rows, "label boolean, text string")
    )


def _paths(tmp_path):
    return (
        str(tmp_path / "idx"),
        str(tmp_path / "acc"),
        str(tmp_path / "rej"),
        str(tmp_path / "ver"),
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_epoch_routes_quality_and_dups(spark, tmp_path):
    idx, acc, rej, ver = _paths(tmp_path)
    model = _model(spark)
    # epoch 0: two clean docs + one junk doc
    CU.curate_epoch(
        _docs(spark, [(1, CLEAN_A), (2, CLEAN_B), (3, CLEAN_A + " " + SPAM)]),
        0, model, idx, acc, rej, ver,
    )
    acc0 = {r.doc_id for r in spark.read.parquet(f"{acc}/batch=0").collect()}
    rej0 = spark.read.parquet(f"{rej}/batch=0").collect()
    assert acc0 == {1, 2}
    assert [r.doc_id for r in rej0] == [3]
    assert rej0[0].score_q < 0  # the drop is attributable

    # epoch 1: a near-copy of doc 1 (dedup gate), one novel clean doc,
    # one junk doc (quality gate)
    CU.curate_epoch(
        _docs(
            spark,
            [(10, CLEAN_A + " indeed"), (11, CLEAN_C), (12, SPAM + " again")],
        ),
        1, model, idx, acc, rej, ver,
    )
    acc1 = {r.doc_id for r in spark.read.parquet(f"{acc}/batch=1").collect()}
    rej1 = {r.doc_id for r in spark.read.parquet(f"{rej}/batch=1").collect()}
    assert acc1 == {11}
    assert rej1 == {12}
    verd1 = {
        r.doc_id: r.is_dup
        for r in spark.read.parquet(f"{ver}/batch=1").collect()
    }
    assert verd1[10] is True  # suppressed by the index, not quality
    # rejected junk never reached the dedup gate (no verdict row)
    assert 12 not in verd1


def test_epoch_replay_is_idempotent(spark, tmp_path):
    idx, acc, rej, ver = _paths(tmp_path)
    model = _model(spark)
    CU.curate_epoch(_docs(spark, [(1, CLEAN_A)]), 0, model, idx, acc, rej, ver)

    def snapshot():
        return (
            sorted(
                (r.doc_id,)
                for r in spark.read.parquet(f"{acc}/batch=1").collect()
            ),
            sorted(
                (r.doc_id, r.is_dup)
                for r in spark.read.parquet(f"{ver}/batch=1").collect()
            ),
            spark.read.option("basePath", idx).parquet(idx).count(),
        )

    batch1 = [(10, CLEAN_A + " copy"), (11, CLEAN_B), (12, SPAM)]
    CU.curate_epoch(_docs(spark, batch1), 1, model, idx, acc, rej, ver)
    first = snapshot()
    # replay the SAME epoch (a restart re-delivering the micro-batch)
    CU.curate_epoch(_docs(spark, batch1), 1, model, idx, acc, rej, ver)
    assert snapshot() == first  # no double-append anywhere


def test_stream_curate_non_default_width(spark, tmp_path):
    """A 4096-bucket saved artifact must keep its modulus through the
    stream's model pinning (r8 regression: stream_curate re-pinned the
    NBModel without n_features, silently scoring every epoch at the
    1024 default — plausible wrong verdicts on the public --curate
    path)."""
    rows = [(True, CLEAN_A), (True, CLEAN_B), (True, CLEAN_C)] + [
        (False, f"{SPAM} extra{i}") for i in range(3)
    ]
    trained = train_quality_nb(
        spark.createDataFrame(rows, "label boolean, text string"),
        n_features=4096,
    )
    mpath = str(tmp_path / "model")
    save_quality_model(trained, mpath)
    model = load_quality_model(spark, mpath)
    assert model.n_features == 4096

    docs = [(1, CLEAN_A), (2, CLEAN_B), (3, SPAM + " y"), (4, CLEAN_C)]
    expected = {
        r.doc_id: (r.is_quality, r.score_q)
        for r in score_quality(_docs(spark, docs), model).collect()
    }
    assert {d: v for d, (v, _) in expected.items()} == {
        1: True, 2: True, 3: False, 4: True
    }
    # teeth: dropping n_features (the exact r8 bug shape) must change
    # the integer scores, or the score_q pin below is vacuous (verdicts
    # alone can coincide on a corpus this small)
    dropped = NBModel(weights=model.weights, consts=model.consts)
    wrong = {
        r.doc_id: (r.is_quality, r.score_q)
        for r in score_quality(_docs(spark, docs), dropped).collect()
    }
    assert wrong != expected

    idx, acc, rej, ver = _paths(tmp_path)
    spool = str(tmp_path / "in")
    os.makedirs(spool)
    with open(os.path.join(spool, "b0.txt"), "w") as f:
        for doc_id, text in docs:
            f.write(f"{doc_id} {text}\n")
    sp = F.split(F.col("value"), " ", 2)
    stream_docs = spark.readStream.text(spool).select(
        sp[0].cast("long").alias("doc_id"), sp[1].alias("text")
    )
    q = CU.stream_curate(
        stream_docs, model, idx, acc, rej, ver, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    accepted = {r.doc_id for r in spark.read.parquet(acc).collect()}
    rej_rows = spark.read.parquet(rej).collect()
    assert accepted == {d for d, (v, _) in expected.items() if v}
    # the quarantine sink's attributable score must be the 4096-width
    # score, bit-exact — the wrong-modulus score differs (teeth above)
    assert {r.doc_id: r.score_q for r in rej_rows} == {
        d: s for d, (v, s) in expected.items() if not v
    }


def test_stream_curate_end_to_end(spark, tmp_path):
    idx, acc, rej, ver = _paths(tmp_path)
    model = _model(spark)
    spool = str(tmp_path / "in")
    os.makedirs(spool)
    batches = [
        [(1, CLEAN_A), (2, SPAM + " x")],
        [(10, CLEAN_A + " again"), (11, CLEAN_B)],
    ]
    t0 = time.time() - 20
    for i, rows in enumerate(batches):
        with open(os.path.join(spool, f"b{i}.txt"), "w") as f:
            for doc_id, text in rows:
                f.write(f"{doc_id} {text}\n")
        os.utime(os.path.join(spool, f"b{i}.txt"), (t0 + i, t0 + i))
    src = spark.readStream.option("maxFilesPerTrigger", "1").text(spool)
    sp = F.split(F.col("value"), " ", 2)
    docs = src.select(
        sp[0].cast("long").alias("doc_id"), sp[1].alias("text")
    )
    q = CU.stream_curate(
        docs, model, idx, acc, rej, ver, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    accepted = {r.doc_id for r in spark.read.parquet(acc).collect()}
    rejected = {r.doc_id for r in spark.read.parquet(rej).collect()}
    assert accepted == {1, 11}  # 10 deduped, 2 junk
    assert rejected == {2}
