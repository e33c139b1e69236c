"""Streaming line sources (SURVEY.md §2.A1-A5).

Every source yields the same two-column contract the batch layer consumes:
``line string, ts double`` (epoch seconds — the processing-time stamp the
reference assigns at receipt, readport.py:449-453), so the extraction plan
is source-agnostic: swap TCP for Kafka/files without touching the parse.

- :func:`socket_lines` — dev-mode TCP framing parity (A1). One line per
  row; partial-line buffering and joined-message splitting are the socket
  source's own framing, same as TCPClient.readline (readport.py:122-149).
  Reconnect-on-failure (A2/A3) maps to streaming-query restart policy: the
  supervisor (pipeline.run_supervised) restarts the query, mirroring the
  reference's listen_device retry loop (readport.py:95-118).
- :func:`rate_lines` — the synthetic generator (A5): a port of the
  reference's fake_server message shape ("<level> RH= <rh> %RH T= <temp>
  'C ID=<id>", extras/fake_server.py:28-30) on the rate source. Values are
  a deterministic function of the sequence number, so tests can assert
  exact output; `rows_per_second` plays --frequency.
- :func:`file_lines` — newline-delimited text files as a stream; the
  production-shaped source (what 100 TB of spooled device logs look like),
  and the replayable one used by the integration tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GENERATOR_FMT = "%02d RH= %+08.3f %%RH T= %+08.3f 'C ID=%07d"


def socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP line stream; includeTimestamp = processing-time stamping (A6)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", "true")
        .load()
    )
    return raw.select(
        F.col("value").alias("line"),
        F.col("timestamp").cast("double").alias("ts"),
    )


def generator_line(seq) -> F.Column:
    """Deterministic fake_server-shaped message for sequence number *seq*.

    level cycles {1, 2} (fake_server levels), rh/temp are zigzag functions
    of seq in (-99.99, 99.99) (the generator's uniform range), id is the
    sequential message counter (fake_server.py:35-59 semantics, made
    reproducible for oracle checks).
    """
    level = (seq % 2 + 1).cast("int")
    rh = ((seq * 7919) % 19998) / 100.0 - 99.99
    temp = ((seq * 104729) % 19998) / 100.0 - 99.99
    return F.format_string(GENERATOR_FMT, level, rh, temp, seq.cast("long"))


def rate_lines(
    spark: SparkSession, rows_per_second: int = 2, num_partitions: int | None = None
) -> DataFrame:
    """Synthetic generator stream (A5): rate source + templated printf."""
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    raw = reader.load()  # columns: timestamp, value (sequence number)
    return raw.select(
        generator_line(F.col("value")).alias("line"),
        F.col("timestamp").cast("double").alias("ts"),
    )


def generator_batch(spark: SparkSession, n: int) -> DataFrame:
    """Batch twin of :func:`rate_lines` (spark.range + same template) —
    used for oracle checks and load testing the parse plan."""
    return spark.range(n).select(
        F.col("id").alias("seq"),
        generator_line(F.col("id")).alias("line"),
        (F.lit(1.7e9) + F.col("id") * 0.05).alias("ts"),  # 20 Hz replay clock
    )


def file_lines(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Spooled line files as a stream; processing-time stamped at read."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(path)
    return raw.select(
        F.col("value").alias("line"),
        F.current_timestamp().cast("double").alias("ts"),
    )


# ---------------------------------------------------------------------------
# Kafka (SURVEY.md §1.4 — the production line-source; VERDICT r5 item 7)
# ---------------------------------------------------------------------------

#: engine defaults for the Kafka reader; callers override via extra opts
KAFKA_DEFAULTS = {"failOnDataLoss": "false"}


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact option dict the Kafka reader is built with — factored
    out so the config surface is unit-testable WITHOUT a broker or the
    spark-sql-kafka connector jar (neither ships in the sandbox; on a
    real cluster add ``--packages org.apache.spark:spark-sql-kafka-0-10``,
    the standard public connector)."""
    if not bootstrap_servers:
        raise ValueError("kafka source requires bootstrap servers")
    if not topic:
        raise ValueError("kafka source requires a topic")
    opts = dict(KAFKA_DEFAULTS)
    opts.update(
        {
            "kafka.bootstrap.servers": bootstrap_servers,
            "subscribe": topic,
            "startingOffsets": starting_offsets,
        }
    )
    opts.update(extra or {})
    return opts


def kafka_project(raw: DataFrame) -> DataFrame:
    """Kafka record -> the engine's ``line string, ts double`` contract:
    value bytes decode as UTF-8 (same as the socket framing), the broker
    append timestamp plays the processing-time stamp (A6). Pure
    projection — testable on a batch frame with the Kafka schema."""
    return raw.select(
        F.col("value").cast("string").alias("line"),
        F.col("timestamp").cast("double").alias("ts"),
    )


def kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    extra: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka topic as a line stream. One partition maps to one Spark
    input partition; offsets ride the checkpoint, so the exactly-once
    pack sink's replay guarantees hold end-to-end (unlike the socket
    source, which is non-replayable — SURVEY.md §1.4)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets, extra
    ).items():
        reader = reader.option(k, v)
    return kafka_project(reader.load())


def build_source(spark: SparkSession, profile) -> DataFrame:
    """Dispatch a DeviceProfile's ``source`` kind to its line stream —
    the one place run_ingest derives a source from config (A25)."""
    kind = getattr(profile, "source", "socket")
    if kind == "socket":
        return socket_lines(spark, profile.host, profile.port)
    if kind == "kafka":
        return kafka_lines(spark, profile.kafka_servers, profile.kafka_topic)
    if kind == "rate":
        return rate_lines(spark)
    if kind == "file":
        return file_lines(spark, profile.spool_dir)
    raise ValueError(f"unknown source kind {kind!r}")
