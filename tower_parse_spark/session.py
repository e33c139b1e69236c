"""SparkSession construction and test-table loading.

Local-mode settings follow the driver environment (local[32], single JVM):
shuffle partitions sized to cores rather than the 200 default, AQE enabled
so runtime stats re-plan joins/coalesce partitions — the knobs that keep the
same code viable on a real multi-executor cluster at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "tower_parse_spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this workload.

    - ``spark.sql.shuffle.partitions`` = cores: local mode has no network
      shuffle, 200 partitions on 60k rows is pure overhead; on a real
      cluster this is overridden per-deployment (AQE coalesces anyway).
    - AQE on: runtime broadcast-join conversion + skew-join splitting,
      the scale-out insurance for the big joins/aggs in this engine.
    - UTC session timezone: required for value-parity with the DuckDB
      oracle (naive UTC timestamps).
    - Arrow enabled: every Pandas-UDF operator (packs, multimodal,
      similarity fallbacks) rides vectorized Arrow batches.
    """
    n = cpus or CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet has shipped as TIMESTAMP(NANOS), which the
        # vectorized reader rejects without this conf; load_table's
        # normalize_event_ts rebuilds the canonical timestamp either way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate how many input splits the file scan will produce, from
    file metadata only (no job, no RDD conversion): each file yields
    ceil(size / maxPartitionBytes) splits. Returns None for non-file
    relations (literal rows, streams, post-shuffle plans)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    max_bytes = int(str(raw).lower().rstrip("b") or 134217728)
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    total = 0
    for uri in files:
        p = jvm.org.apache.hadoop.fs.Path(uri)
        fs = p.getFileSystem(hconf)
        total += -(-fs.getFileStatus(p).getLen() // max_bytes)
    return int(total)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    cores — used in front of compute-bound projections (minhash/simhash
    signature hashing). A small parquet table arrives as ONE input split,
    which would serialize per-row CPU work; a big table (the 100 TB case)
    already has >= cores splits and passes through untouched, so the
    shuffle is only paid when it is worth cores-x speedup.

    The partition probe is file-metadata arithmetic (size /
    maxPartitionBytes per file): job-free, no DataFrame->RDD conversion,
    a handful of filesystem stats. When the file count already reaches
    the target the stats are skipped too; non-file relations fall back
    to the RDD partition count (tiny literal test inputs)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= target:
        return df  # >= one split per file: parallel enough already
    est = _estimated_scan_splits(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize an ``events``-shaped ``ts`` column to session-tz TIMESTAMP
    regardless of the parquet fixture's physical shape. The test fixtures
    have shipped in (at least) three shapes across regenerations, and any
    of them must analyze identically downstream:

    - ``bigint`` — TIMESTAMP(NANOS) read under ``nanosAsLong``: rebuild a
      micros-precision timestamp with integer math (``div 1000`` — double
      division would lose precision above 2^53 nanos).
    - ``timestamp_ntz`` — plain micros with no zone: cast to TIMESTAMP.
      The session runs in UTC, so the cast is exact and value-identical
      to DuckDB's ``epoch(ts)`` on the same file.
    - ``timestamp`` — already the canonical shape; passthrough.

    Downstream code may then rely on ``ts.cast("double")`` (epoch seconds)
    analyzing — TIMESTAMP_NTZ does not support that cast, which is why the
    normalization lives at the single load entry point.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; columnar parquet scan with pushdown/pruning.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (rejected by the
    vectorized reader unless ``spark.sql.legacy.parquet.nanosAsLong`` is
    on — set here as a runtime SQL conf so the engine also works on a
    caller's plain SparkSession) and as micros TIMESTAMP_NTZ. Either way,
    ``normalize_event_ts`` rebuilds the canonical session-tz TIMESTAMP.
    """
    # Defensive runtime conf, like nanosAsLong below: every timestamp
    # semantic in this engine (NTZ casts, date_trunc, window(), epoch
    # doubles) assumes a UTC session for value parity with the tz-naive
    # DuckDB oracle. The engine's own get_spark() sets it at build time;
    # pin it here too so a CALLER's plain session (the driver's) is safe
    # even if the host stops defaulting to UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every test table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
