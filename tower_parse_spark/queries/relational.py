"""Relational surface: joins, aggregations, windows, set ops, rollup.

The reference defers all aggregation/joins to its downstream central server
(README.md:3; SURVEY.md §2.B "Aggregations: absent"). This module IS that
downstream surface, built on Catalyst primitives: declarative plans so
predicate pushdown, column pruning, join selection and AQE all apply.

Scale notes (100 TB posture):
- Dimension tables (region, nation, supplier, customer at this ratio) are
  broadcast explicitly; fact-fact joins (lineitem x orders) stay sort-merge
  on the join key and benefit from AQE skew splitting.
- Aggregations are partial (map-side combine) by construction — groupBy/agg
  with algebraic aggregates only.
- Top-k uses a deterministic tie-break so results are stable under any
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter + 8 algebraic aggregates.

    Flagship query: exercises pushdown (shipdate filter + column pruning
    reach the parquet scan) and partial aggregation on a low-cardinality
    key pair — the plan that must survive a 100 TB lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 4)                                          AS avg_qty,
  round(avg(l_extendedprice), 4)                                     AS avg_price,
  round(avg(l_discount), 4)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k.

    customer is broadcast (small side); orders x lineitem is the real
    shuffle, on the join key both sides. Deterministic top-10 via
    (revenue DESC, o_orderkey) tie-break.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-30").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-30").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


Q3_ORACLE = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join through region->nation->cust/supp.

    All dimensions broadcast; lineitem is the only large scan. The
    c_nationkey = s_nationkey constraint rides the joined row, no extra
    shuffle.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


Q5_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 customers by order revenue within each nation.

    Agg first (shrinks data), then window over the aggregate — the window
    partitions on the same key as the preceding groupBy so AQE can reuse
    the exchange.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = W.partitionBy("n_name").orderBy(
        F.col("total_spent").desc(), F.col("c_custkey")
    )
    return (
        per_cust.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spent", "rank_in_nation")
        .orderBy("n_name", "rank_in_nation")
    )


TOP_CUSTOMERS_ORACLE = """
WITH per_cust AS (
  SELECT n_name, c_custkey, c_name,
         round(sum(o_totalprice), 2) AS total_spent
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey, c_name
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY n_name ORDER BY total_spent DESC, c_custkey
         ) AS rank_in_nation
  FROM per_cust
)
SELECT n_name, c_custkey, c_name, total_spent, rank_in_nation
FROM ranked
WHERE rank_in_nation <= 3
ORDER BY n_name, rank_in_nation
"""


def running_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with frame: month-over-month running revenue sum.

    Frame = unbounded-preceding..current per nation ordered by month;
    exercises the sliding-frame window executor.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = W.partitionBy("n_name").orderBy("month").rowsBetween(W.unboundedPreceding, 0)
    return (
        monthly.withColumn("running_revenue", F.round(F.sum("revenue").over(w), 2))
        .select("n_name", "month", "revenue", "running_revenue")
        .orderBy("n_name", "month")
    )


RUNNING_REVENUE_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, month, revenue,
       round(sum(revenue) OVER (
         PARTITION BY n_name ORDER BY month
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_revenue
FROM monthly
ORDER BY n_name, month
"""


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no 1-URGENT order.

    left_anti avoids materializing the join: one shuffle, no row
    amplification — the scalable form of EXCEPT on keys.
    """
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_URGENT_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


def part_supplier_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: parts shipped by both BUILDING and AUTOMOBILE
    segment customers (INTERSECT), as distinct part keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def parts_for(segment: str) -> DataFrame:
        return (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                F.broadcast(cust.filter(F.col("c_mktsegment") == segment)),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("l_partkey")
        )

    return (
        parts_for("BUILDING")
        .intersect(parts_for("AUTOMOBILE"))
        .withColumnRenamed("l_partkey", "partkey")
        .orderBy("partkey")
    )


PART_SUPPLIER_OVERLAP_ORACLE = """
SELECT l_partkey AS partkey
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT l_partkey AS partkey
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'AUTOMOBILE'
ORDER BY partkey
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (region, nation) with grouping ids.

    Demonstrates multi-level aggregation in one pass (partial aggs per
    grouping set) instead of N scans.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


REVENUE_ROLLUP_ORACLE = """
SELECT r_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per status x priority, priorities as columns."""
    orders = load_table(spark, sf_dir, "orders")
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_not_specified",
        "5-LOW": "n_low",
    }
    for old, new in renames.items():
        pivoted = pivoted.withColumnRenamed(old, new)
    cols = ["o_orderstatus"] + list(renames.values())
    return pivoted.select(*[F.coalesce(F.col(c), F.lit(0)).alias(c) if c != "o_orderstatus" else F.col(c) for c in cols]).orderBy(
        "o_orderstatus"
    )


ORDER_PRIORITY_PIVOT_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_not_specified,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_ORACLE, "TPC-H Q1 flagship"),
    "q3_shipping_priority": Query(q3_shipping_priority, Q3_ORACLE, "join+agg+topk"),
    "q5_local_supplier": Query(q5_local_supplier, Q5_ORACLE, "snowflake join"),
    "top_customers_per_nation": Query(
        top_customers_per_nation, TOP_CUSTOMERS_ORACLE, "ranking window"
    ),
    "running_revenue_by_nation": Query(
        running_revenue_by_nation, RUNNING_REVENUE_ORACLE, "analytic frame window"
    ),
    "customers_without_urgent_orders": Query(
        customers_without_urgent_orders, CUSTOMERS_WITHOUT_URGENT_ORACLE, "anti join"
    ),
    "part_supplier_overlap": Query(
        part_supplier_overlap, PART_SUPPLIER_OVERLAP_ORACLE, "set ops (intersect)"
    ),
    "revenue_rollup": Query(revenue_rollup, REVENUE_ROLLUP_ORACLE, "rollup grouping sets"),
    "order_priority_pivot": Query(
        order_priority_pivot, ORDER_PRIORITY_PIVOT_ORACLE, "pivot"
    ),
}
