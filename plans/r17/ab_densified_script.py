"""Densified volume A/B (VERDICT r16 #2): old shape (dedup THEN score)
vs new shape (score+threshold THEN dedup) through the history-probe
stage of incremental_minhash_dedup_with_banded, at ~1-2M band-collision
candidates, sized to survive an 8 GB heap.

Builds a synthetic banded index + batch whose band keys collide in
controlled hot buckets. Both shapes run on the SAME inputs
(localCheckpointed once), interleaved best-of-3, with per-shape shuffle
read/write bytes pulled from the REST status API (UI enabled here).
Verdict equality asserted (collect-sorted).
"""
import gc
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS_BATCH = 2_000    # batch docs
N_DOCS_HIST = 20_000    # history docs
BANDS = 4               # band rows per doc (= LSH_BANDS)
HOT_BUCKETS = 100       # band keys shared between batch and history
K = 16                  # minhash signature length (= MINHASH_K)

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab_densified")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "true")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tower_parse_spark.operators.dedup import est_jaccard  # noqa: E402

# synthetic banded relations: band_key = md5-ish string over bucket id;
# mh = K-long deterministic signature per doc. Hot buckets: batch rows
# spread over HOT_BUCKETS keys, history rows over the same keys ->
# candidates = sum over buckets of (batch_in_bucket * hist_in_bucket).
bucket = (F.col("id") % HOT_BUCKETS).cast("string")
mh = F.transform(
    F.sequence(F.lit(1), F.lit(K)),
    lambda i: F.xxhash64(F.col("id") % 97, i),  # ~3% est overlap by luck
)


def banded(n, id_off):
    df = (
        spark.range(0, n, 1, 32)
        .select((F.col("id") + id_off).alias("id"))
        .select(
            F.col("id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(BANDS - 1)),
                    lambda b: F.concat(
                        F.lit("bk"), (F.col("id") % HOT_BUCKETS).cast("string"),
                        F.lit("_"), b.cast("string"),
                    ),
                )
            ).alias("band_key"),
            mh.alias("mh"),
        )
    )
    return df.localCheckpoint(eager=True)


batch = banded(N_DOCS_BATCH, 1_000_000).withColumnsRenamed(
    {"id": "_nid", "mh": "mh1"}
)
hist = banded(N_DOCS_HIST, 0).withColumnsRenamed({"id": "_hid", "mh": "mh2"})
est = est_jaccard(F.col("mh1"), F.col("mh2"))
THRESHOLD = 0.5

n_cand = (
    hist.join(F.broadcast(batch), "band_key")
    .groupBy().count().first()[0]
)
print(f"band-collision candidates: {n_cand:,}")


def old_shape():
    # pre-r16: dedup the full candidate set (two K-long arrays per row
    # through the exchange), THEN score and threshold
    return (
        hist.join(F.broadcast(batch), "band_key")
        .select("_nid", "_hid", "mh1", "mh2")
        .dropDuplicates(["_nid", "_hid"])
        .select("_nid", "_hid", est.alias("est"))
        .filter(F.col("est") >= THRESHOLD)
        .groupBy("_nid")
        .agg(F.count(F.lit(1)).alias("n"), F.max("est").alias("m"))
    )


def new_shape():
    # r16: score+threshold BEFORE the dedup exchange
    return (
        hist.join(F.broadcast(batch), "band_key")
        .select("_nid", "_hid", est.alias("est"))
        .filter(F.col("est") >= THRESHOLD)
        .dropDuplicates(["_nid", "_hid"])
        .groupBy("_nid")
        .agg(F.count(F.lit(1)).alias("n"), F.max("est").alias("m"))
    )


def run(tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    t0 = time.monotonic()
    fn().write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    sc.setJobGroup(None, None)
    return dt


def shuffle_bytes(tag):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs")
    )
    stage_ids = set()
    for j in jobs:
        if j.get("jobGroup") == tag:
            stage_ids.update(j["stageIds"])
    rd = wr = 0
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages")
    )
    for s in stages:
        if s["stageId"] in stage_ids and s["status"] == "COMPLETE":
            rd += s["shuffleReadBytes"]
            wr += s["shuffleWriteBytes"]
    return rd, wr


# equality witness first
a = sorted(map(tuple, old_shape().collect()))
b = sorted(map(tuple, new_shape().collect()))
assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
print(f"verdict-identical: {len(a)} rows")

results = {"old": [], "new": []}
for i in range(3):
    for tag, fn in (("old", old_shape), ("new", new_shape)):
        results[tag].append(run(f"{tag}{i}", fn))
        gc.collect()
for tag in ("old", "new"):
    rd, wr = 0, 0
    for i in range(3):
        r, w = shuffle_bytes(f"{tag}{i}")
        rd, wr = rd + r, wr + w
    ts = ", ".join(f"{t:.2f}" for t in results[tag])
    print(
        f"{tag}: best {min(results[tag]):.2f}s of [{ts}] | "
        f"shuffle rd {rd/3/1e6:.1f} MB wr {wr/3/1e6:.1f} MB (mean of 3)"
    )
