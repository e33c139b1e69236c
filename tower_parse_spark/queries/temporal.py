"""Event-time analytics over the ``events`` stream table.

The reference has no event-time concept at all (processing-time only,
SURVEY.md §2.B "watermarks: Absent") — this module is the engine surface
that fills that category: tumbling/sliding time windows, gap-based
sessionization, as-of enrichment, JSON prop extraction, distribution
stats. Batch forms here (oracle-checkable); the same window expressions
run on a stream with ``withWatermark`` (see streaming/pipeline.py).

Timestamp parity notes: the session runs in UTC; events.ts arrives in
whatever parquet shape the current fixture uses (nanos-as-long, micros
NTZ, or micros TZ) and ``session.normalize_event_ts`` canonicalizes it
to a session-tz TIMESTAMP — value-identical to DuckDB's ``epoch(ts)``.
Spark ``window()`` and DuckDB ``date_trunc`` agree on epoch-aligned
tumbling windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tower_parse_spark.functions.rounding import pround, sql_pround
from tower_parse_spark.operators.asof import asof_join
from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (the streaming
    agg shape: window() + groupBy; batch twin of readStream+watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # a NULL event time belongs to no window: Spark's window() drops
        # such rows implicitly; the filter makes the rule explicit and
        # the oracle mirrors it (NULL-events robustness fixture, r6)
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands in 2
    windows — Spark's window() explodes this natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # events.value is 2-decimal quantized: sum exact scaled integers so
        # the average is order-independent (a float sum's partial-agg order
        # differs between engines and runs; with quantized data the result
        # lands exactly on round-half boundaries).
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


# DuckDB twin: explode each event into its 2 containing windows.
EVENTS_SLIDING_ORACLE = """
WITH slid AS (
  SELECT to_timestamp(floor(epoch(ts) / 1800) * 1800 - k.k * 1800)
           AT TIME ZONE 'UTC' AS window_start,
         value
  FROM events, (SELECT 0 AS k UNION ALL SELECT 1) k
  WHERE ts IS NOT NULL
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       {avg_pround} AS avg_value
FROM slid
GROUP BY 1
ORDER BY window_start
""".format(
    avg_pround=sql_pround(
        "sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*)", 4
    )
)


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min inactivity): classic gaps-and-islands —
    lag + cumulative sum of new-session flags, then per-session agg.
    Two window passes over one (user, ts) sort; one shuffle total."""
    ev = load_table(spark, sf_dir, "events").filter(
        # no event time -> no session; also dodges the engines' opposite
        # NULL sort defaults inside the lag window (r6 robustness rule)
        F.col("ts").isNotNull()
    )
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(
        w_user
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w_user.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # pround (floor-based), not native round: both engines see the
            # identical double, and floor is bit-deterministic on it —
            # native round() diverges on half-boundaries.
            pround(
                F.max(F.col("ts").cast("double"))
                - F.min(F.col("ts").cast("double")),
                4,
            ).alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


EVENTS_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
), sessioned AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       {dur} AS duration_s
FROM sessioned
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""".format(dur=sql_pround("max(epoch(ts)) - min(epoch(ts))", 4))


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30 min gap) — the
    built-in operator equivalent of :func:`events_sessionize`; also the
    streaming-capable form (works under withWatermark). Session end =
    last event + gap, per Spark's definition."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# Oracle: rebuild Spark's session_window semantics with gaps-and-islands —
# start = min(ts), end = max(ts) + gap within each 30-min-gap island.
EVENTS_SESSION_WINDOW_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
), sessioned AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sessioned
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event enriched with the customer's most
    recent order at that time (union + last-value carry; one shuffle)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").cast("double").alias("t"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # o_orderdate is TIMESTAMP_NTZ; NTZ -> double needs the
        # session-tz (UTC) timestamp hop, matching DuckDB's epoch()
        F.col("o_orderdate").cast("timestamp").cast("double").alias("ot"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        ev,
        orders,
        on="user_id",
        left_time="t",
        right_time="ot",
        right_payload=["o_orderkey", "o_totalprice"],
        right_tiebreak=["o_orderkey"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    ).orderBy("event_id")


EVENTS_ASOF_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
  WHERE event_type = 'purchase'
), o AS (
  SELECT o_custkey AS user_id, epoch(o_orderdate) AS ot,
         o_orderkey, o_totalprice
  FROM orders
), ranked AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.ot DESC, o.o_orderkey DESC) AS rn
  FROM ev e LEFT JOIN o ON e.user_id = o.user_id AND o.ot <= e.t
)
SELECT event_id, user_id,
       o_orderkey AS last_orderkey,
       o_totalprice AS last_totalprice
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


def events_order_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: each purchase event matched to the same
    user's click events in the following hour — binned interval join
    (operators/rangejoin.py), never a nested-loop; aggregated to
    per-purchase click counts and exact-integer value sums."""
    from tower_parse_spark.operators.rangejoin import range_join

    hour = 3600.0
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").cast("double").alias("t"), "value")
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").cast("double").alias("w_start"),
            (F.col("ts").cast("double") + hour).alias("w_end"),
        )
    )
    j = range_join(
        clicks, purchases, "t", "w_start", "w_end", bin_width=hour,
        on="user_id",
    )
    return (
        j.groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks_1h"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("sum_click_value_1h"),
        )
        .orderBy("purchase_id")
    )


EVENTS_RANGE_JOIN_ORACLE = """
WITH c AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch(ts) AS pt FROM events
  WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       count(*) AS n_clicks_1h,
       sum(CAST(round(c.value * 100) AS BIGINT)) / 100.0
         AS sum_click_value_1h
FROM p JOIN c
  ON c.user_id = p.user_id AND p.pt <= c.t AND c.t < p.pt + 3600.0
GROUP BY p.purchase_id, p.user_id
ORDER BY p.purchase_id
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (get_json_object) + bucket aggregation."""
    ev = load_table(spark, sf_dir, "events")
    # try_cast: malformed/NULL JSON (or a non-numeric k) yields a NULL
    # bucket instead of an ANSI cast error; DuckDB mirrors with
    # json_valid + TRY_CAST (r6 robustness rule)
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.select("event_type", (k % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # value is 2-dp quantized: exact scaled-integer sum is
            # order-independent (double partial-agg sums are not).
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("sum_value"),
        )
        .orderBy("event_type", "k_bucket")
    )


EVENTS_JSON_ORACLE = """
SELECT event_type,
       TRY_CAST(json_extract(CASE WHEN json_valid(props) THEN props END,
                             '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_bucket
"""


def events_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats per event_type: exact percentiles (interpolated),
    stddev, distinct users. The top-k/percentile category.

    Engine-parity design: value is 2-dp quantized, so every statistic is
    computed over exact scaled integers (v100 = round(value*100)) —
    percentile interpolation then happens on integer-valued doubles (both
    engines agree to the ulp, which pround's floor canonicalizes), and
    stddev uses the exact-integer sum-of-squares identity instead of the
    order-dependent streaming variance."""
    ev = load_table(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100).cast("long")
    ev = ev.select("event_type", "user_id", v100.alias("v100"))
    n = F.count(F.lit(1))
    sx = F.sum("v100")
    sx2 = F.sum(F.col("v100") * F.col("v100"))
    # try_divide: a single-row group (n=1) makes the Bessel denominator
    # zero — sd is undefined, and DuckDB's x/0 yields NULL where ANSI `/`
    # raises (NULL-events robustness fixture, r6)
    sd = (
        F.sqrt(
            F.try_divide(
                (n * sx2 - sx * sx).cast("double"),
                (n * (n - F.lit(1))).cast("double"),
            )
        )
        / 100.0
    )
    return (
        ev.groupBy("event_type")
        .agg(
            n.alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            pround(F.percentile("v100", 0.5) / 100.0, 4).alias("p50"),
            pround(F.percentile("v100", 0.95) / 100.0, 4).alias("p95"),
            pround(sd, 4).alias("sd"),
        )
        .orderBy("event_type")
    )


EVENTS_DISTRIBUTION_ORACLE = """
WITH q AS (
  SELECT event_type, user_id, CAST(round(value * 100) AS BIGINT) AS v100
  FROM events
)
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       {p50} AS p50,
       {p95} AS p95,
       {sd} AS sd
FROM q
GROUP BY event_type
ORDER BY event_type
""".format(
    p50=sql_pround("quantile_cont(v100, 0.5) / 100.0", 4),
    p95=sql_pround("quantile_cont(v100, 0.95) / 100.0", 4),
    sd=sql_pround(
        "sqrt(CAST(count(*) * sum(v100 * v100) - sum(v100) * sum(v100)"
        " AS DOUBLE)"
        " / CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 100.0",
        4,
    ),
)


def events_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: per-user event-type histogram as a map column
    — construction (map_from_entries over sorted collected entries),
    size, key lookup (element_at), membership (map_contains_key), keys
    join, value fold (aggregate over map_values), and map_filter. The
    map stays internal; every output column is scalar so the driver's
    pandas canonicalizer can sort/hash rows (dict cells are unhashable,
    same hazard as the r1 customer_order_arrays arrays)."""
    # NULL event_type is excluded from the histogram on both engines: a
    # NULL map KEY is illegal in Spark (NULL_MAP_KEY) and a NULL type is
    # not a type; '' stays a valid key (r6 robustness rule)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    heavy = F.size(
        F.map_filter("m", lambda k, v: v >= 12)
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", "click").alias("n_clicks"),
        F.map_contains_key("m", "error").alias("has_error"),
        F.concat_ws("|", F.map_keys("m")).alias("types_joined"),
        total.alias("n_total"),
        heavy.alias("n_heavy_types"),
    ).orderBy("user_id")


EVENTS_MAP_ORACLE = """
WITH counts AS (
  -- NULL event_type excluded on both engines (Spark NULL_MAP_KEY rule)
  SELECT user_id, event_type, count(*) AS n FROM events
  WHERE event_type IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT user_id,
         map_from_entries(list_sort(list(struct_pack(k := event_type,
                                                     v := n)))) AS m
  FROM counts GROUP BY user_id
)
SELECT user_id,
       cardinality(m) AS n_types,
       CAST(m['click'][1] AS BIGINT) AS n_clicks,
       list_contains(map_keys(m), 'error') AS has_error,
       array_to_string(map_keys(m), '|') AS types_joined,
       CAST(list_aggregate(map_values(m), 'sum') AS BIGINT) AS n_total,
       len(list_filter(map_values(m), x -> x >= 12)) AS n_heavy_types
FROM m ORDER BY user_id
"""


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: hour-resolution and
    day-resolution continuous aggregates (plus the grand total) computed
    in ONE pass via ROLLUP over (day, hour) truncations — partial aggs
    are reused across resolutions instead of re-scanning per level, the
    property that makes multi-resolution dashboards cheap at 100 TB.
    value is 2-decimal quantized, so the sum is carried as exact scaled
    longs (partial-agg-order independent) and rescaled at the edge."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    return (
        t.rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("sum_value"),
        )
        .orderBy(
            F.col("day").asc_nulls_first(), F.col("hour").asc_nulls_first()
        )
    )


EVENTS_TIME_ROLLUP_ORACLE = """
WITH t AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         value
  FROM events
)
SELECT day, hour,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM t
GROUP BY ROLLUP (day, hour)
ORDER BY day ASC NULLS FIRST, hour ASC NULLS FIRST
"""


QUERIES = {
    "events_tumbling_window": Query(
        events_tumbling_window, EVENTS_TUMBLING_ORACLE, "tumbling time window"
    ),
    "events_time_rollup": Query(
        events_time_rollup,
        EVENTS_TIME_ROLLUP_ORACLE,
        "hypertable-style multi-resolution time rollup",
    ),
    "events_sliding_window": Query(
        events_sliding_window, EVENTS_SLIDING_ORACLE, "sliding time window"
    ),
    "events_sessionize": Query(
        events_sessionize, EVENTS_SESSIONIZE_ORACLE, "gap sessionization"
    ),
    "events_session_window": Query(
        events_session_window,
        EVENTS_SESSION_WINDOW_ORACLE,
        "native session_window operator",
    ),
    "events_asof_order": Query(
        events_asof_order, EVENTS_ASOF_ORACLE, "as-of join enrichment"
    ),
    "events_order_range_join": Query(
        events_order_range_join,
        EVENTS_RANGE_JOIN_ORACLE,
        "binned range (interval) join",
    ),
    "events_json_props": Query(
        events_json_props, EVENTS_JSON_ORACLE, "JSON extraction"
    ),
    "events_map_functions": Query(
        events_map_functions, EVENTS_MAP_ORACLE, "map function family"
    ),
    "events_value_distribution": Query(
        events_value_distribution,
        EVENTS_DISTRIBUTION_ORACLE,
        "percentiles / distinct / stddev",
    ),
}
