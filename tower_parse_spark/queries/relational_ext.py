"""Relational surface extensions: semi joins, set operations, scalar
function families (string/date/math), correlated aggregates.

Covers the §2.B categories the base relational module doesn't: EXISTS
(semi), INTERSECT/EXCEPT, the scalar function library, and the
correlated-subquery shape (decorrelated by Catalyst into a join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tower_parse_spark.functions.rounding import pround, sql_pround
from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table


def orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — order-priority counts over
    orders having at least one returned lineitem. Catalyst plans a
    left-semi hash join: no row duplication, fact side streams."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    semi = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORDERS_RETURNS_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with BUILDING-segment-sized balances in
    both halves — INTERSECT and EXCEPT composed, counted by nation."""
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_nationkey")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_nationkey"
    )
    both = rich.intersect(building)
    rich_not_building = rich.exceptAll(building)
    return (
        both.withColumn("set_kind", F.lit("rich_and_building"))
        .unionByName(
            rich_not_building.withColumn("set_kind", F.lit("rich_only"))
        )
        .groupBy("set_kind", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("set_kind", "c_nationkey")
    )


SEGMENT_SET_OPS_ORACLE = """
WITH rich AS (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
), building AS (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
), tagged AS (
  SELECT *, 'rich_and_building' AS set_kind FROM (
    SELECT * FROM rich INTERSECT SELECT * FROM building)
  UNION ALL
  SELECT *, 'rich_only' AS set_kind FROM (
    SELECT * FROM rich EXCEPT ALL SELECT * FROM building)
)
SELECT set_kind, c_nationkey, count(*) AS n_customers
FROM tagged
GROUP BY set_kind, c_nationkey
ORDER BY set_kind, c_nationkey
"""


def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part: case mapping, substring, padding,
    replace, split, concat, length/position predicates."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.lower(F.col("p_type")).alias("type_lower"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.element_at(F.split(F.col("p_type"), " "), 1).alias("type_head"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
    ).orderBy("p_partkey")


PART_STRING_ORACLE = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       replace(p_type, ' ', '_') AS type_snake,
       string_split(p_type, ' ')[1] AS type_head,
       p_brand || '|' || p_type AS brand_type,
       instr(p_name, 'a') AS first_a
FROM part
ORDER BY p_partkey
"""


def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family: parts, truncation, arithmetic, diffs,
    day-of-week, formatting — aggregated so the output stays small."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.select(
            F.year(d).alias("y"),
            F.quarter(d).alias("q"),
            F.month(d).alias("m"),
            F.dayofweek(d).alias("dow"),  # 1=Sunday (both engines adjusted below)
            F.datediff(F.lit("2025-01-01").cast("date"), d.cast("date")).alias(
                "days_to_2025"
            ),
            F.date_format(d, "yyyy-MM").alias("ym"),
            "o_totalprice",
        )
        .groupBy("y", "q", "m", "dow", "ym")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("days_to_2025").alias("min_days_to_2025"),
            pround(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("y", "q", "m", "dow", "ym")
    )


ORDERS_DATE_ORACLE = f"""
SELECT year(o_orderdate) AS y,
       quarter(o_orderdate) AS q,
       month(o_orderdate) AS m,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(o_orderdate, '%Y-%m') AS ym,
       count(*) AS n,
       min(datediff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01'))
         AS min_days_to_2025,
       {sql_pround("avg(o_totalprice)", 4)} AS avg_price
FROM orders
GROUP BY 1, 2, 3, 4, 5
ORDER BY y, q, m, dow, ym
"""


def _q4(col: F.Column) -> F.Column:
    """Quantize a double to an exact 4-dp integer BEFORE summing, so the
    aggregate is an order-independent integer sum (double partial-agg sums
    are order-dependent in their last bits, which 4-dp rounding of a ~1e7
    total cannot canonicalize — r1 hash-fail fix)."""
    return F.floor(col * 10000.0 + F.lit(0.5)).cast("long")


def lineitem_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family: abs/sign/ceil/floor, sqrt/ln/exp, pow, mod,
    greatest/least — folded into per-returnflag aggregates.

    Every double aggregate is quantized-then-summed: the per-row value is
    rounded to an exact integer of 1e-4 units, summed exactly as BIGINT,
    and divided back — deterministic under any partial-agg order on both
    Spark and DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice")
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.sum(_q4(F.sqrt(v))) / 10000.0).alias("sum_sqrt_price"),
            (F.sum(_q4(F.log(v + 1.0))) / 10000.0).alias("sum_ln_price"),
            (F.sum(_q4(F.pow(q, 2.0))) / 10000.0).alias("sum_qty_sq"),
            F.sum(F.ceil(F.col("l_discount") * 100)).alias("sum_disc_pct_ceil"),
            F.sum(F.floor(q / 7)).alias("sum_qty_div7"),
            F.sum((q.cast("long") % 5)).alias("sum_qty_mod5"),
            (
                F.sum(_q4(F.greatest(F.col("l_tax"), F.col("l_discount"))))
                / 10000.0
            ).alias("sum_max_rate"),
        )
        .orderBy("l_returnflag")
    )


def _sql_q4(expr: str) -> str:
    """DuckDB twin of _q4: exact 4-dp integer quantization pre-sum."""
    return f"CAST(floor(({expr}) * 10000.0 + 0.5) AS BIGINT)"


LINEITEM_MATH_ORACLE = f"""
SELECT l_returnflag,
       sum({_sql_q4("sqrt(l_extendedprice)")}) / 10000.0 AS sum_sqrt_price,
       sum({_sql_q4("ln(l_extendedprice + 1.0)")}) / 10000.0 AS sum_ln_price,
       sum({_sql_q4("pow(l_quantity, 2.0)")}) / 10000.0 AS sum_qty_sq,
       CAST(sum(ceil(l_discount * 100)) AS BIGINT) AS sum_disc_pct_ceil,
       CAST(sum(floor(l_quantity / 7)) AS BIGINT) AS sum_qty_div7,
       CAST(sum(CAST(l_quantity AS BIGINT) % 5) AS BIGINT) AS sum_qty_mod5,
       sum({_sql_q4("greatest(l_tax, l_discount)")}) / 10000.0 AS sum_max_rate
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def min_cost_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q2 core): parts priced at their
    brand's minimum. Catalyst decorrelates to an aggregate + join; the
    brand-minimum relation is tiny -> broadcast."""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(F.broadcast(mins), "p_brand")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


MIN_COST_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
ORDER BY p_brand, p_partkey
"""


def top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Fact filtered at scan, dims broadcast, single agg shuffle, top-k via
    TakeOrderedAndProject (no full sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TOP_RETURNS_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def priority_ship_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM) over a
    joined fact — the or-predicate + pivot-style counting pattern."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


PRIORITY_SHIP_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio (promo revenue share) —
    a single global aggregate; part dim broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        pround(
            F.lit(100.0)
            * F.sum(F.when(promo, rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_pct")
    )


PROMO_REVENUE_ORACLE = f"""
SELECT {sql_pround(
    "100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
    "/ sum(l_extendedprice * (1 - l_discount))", 4)} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across the
    join — Catalyst pushes the common l_quantity bounds to the scan and
    evaluates the OR branches post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    ) | (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 40))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


DISJUNCTIVE_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
"""


def customer_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: per-customer collected order priorities —
    sorted collect, distinct, indexing, containment. collect_list is
    per-group bounded (orders per customer), not a driver collect."""
    orders = load_table(spark, sf_dir, "orders")
    prios = F.array_sort(F.collect_list("o_orderpriority"))
    return (
        orders.groupBy("o_custkey")
        .agg(prios.alias("prios"))
        .select(
            "o_custkey",
            F.size(F.col("prios")).alias("n_orders"),
            # Serialized at the query edge: the driver's pandas
            # canonicalizer sorts/hashes rows and crashes on list cells
            # (r1 ERR) — the array ops stay under test, the output is scalar.
            F.array_join(
                F.array_sort(F.array_distinct(F.col("prios"))), "|"
            ).alias("distinct_prios"),
            F.element_at(F.col("prios"), 1).alias("first_prio"),
            F.array_contains(F.col("prios"), "1-URGENT").alias("has_urgent"),
        )
        .orderBy("o_custkey")
    )


CUSTOMER_ARRAYS_ORACLE = """
SELECT o_custkey,
       len(prios) AS n_orders,
       array_to_string(list_sort(list_distinct(prios)), '|')
         AS distinct_prios,
       prios[1] AS first_prio,
       list_contains(prios, '1-URGENT') AS has_urgent
FROM (SELECT o_custkey,
             -- FILTER mirrors Spark collect_list, which SKIPS NULLs
             -- (DuckDB's list() keeps them — r6 NULL-fixture rule)
             list_sort(list(o_orderpriority)
                       FILTER (o_orderpriority IS NOT NULL)) AS prios
      FROM orders GROUP BY o_custkey)
ORDER BY o_custkey
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combos —
    completes the grouping-sets family next to revenue_rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


REVENUE_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def order_gaps_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/ntile window family: per-customer order cadence —
    days since previous order, next order price, first-order flag,
    spend quartile within the customer's nation-less stream.

    The per-customer windows are partition-parallel, but a naive
    ``ntile(4).over(Window.orderBy(price DESC, key))`` plans an
    ``Exchange SinglePartition`` that funnels EVERY orders row through
    one task (Spark warns "Moving all data to a single partition") — at
    100x the fixture that one task is the whole job. The quartile is
    instead exact ntile arithmetic over the three-pass value-bucketed
    global rank (``with_global_row_scalable`` + ``ntile_expr``,
    operators/pack.py): same output, no single-partition stage.
    ``reuse="recompute"`` because the input is a bare column-pruned
    scan — cheaper to re-read than to materialize."""
    from tower_parse_spark.operators.pack import (
        ntile_expr,
        with_global_row_scalable,
    )

    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    ranked = with_global_row_scalable(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        order_col="o_totalprice",
        tiebreak_col="o_orderkey",
        descending=True,
        reuse="recompute",
        index_col="_grank",
        total_col="_gtotal",
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    prev_d = F.lag(d).over(w)
    quartile = ntile_expr(F.col("_grank") + 1, F.col("_gtotal"), 4)
    return ranked.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(d, prev_d).alias("days_since_prev"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.row_number().over(w) == 1).alias("is_first_order"),
        quartile.cast("int").alias("price_quartile"),
    ).orderBy("o_orderkey")


ORDER_GAPS_ORACLE = """
SELECT o_orderkey, o_custkey,
       datediff('day',
                lag(CAST(o_orderdate AS DATE)) OVER w,
                CAST(o_orderdate AS DATE)) AS days_since_prev,
       lead(o_totalprice) OVER w AS next_price,
       row_number() OVER w = 1 AS is_first_order,
       ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_orderkey
"""


def part_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): part's numeric measures to (key, measure, value)
    long form — the inverse of the pivot in order_priority_pivot."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "measure", "value")
        .orderBy("p_partkey", "measure")
    )


PART_UNPIVOT_ORACLE = """
SELECT p_partkey, measure, value
FROM (SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             CAST(p_retailprice AS DOUBLE) AS retailprice
      FROM part)
UNPIVOT (value FOR measure IN (size, retailprice))
ORDER BY p_partkey, measure
"""


def big_basket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, joined back to the
    dimension — orders whose total quantity exceeds 150."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(F.col("total_qty"), 2).alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


BIG_BASKET_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150) b
  ON o_orderkey = b.l_orderkey
ORDER BY o_orderkey
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a join-side predicate, then a
    distribution over the grouped counts — customers bucketed by how many
    non-urgent orders they placed (zero-order customers included)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_DISTRIBUTION_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery threshold + anti join —
    above-average-balance customers (within selected country codes) who
    never placed an URGENT order, aggregated per code (the synthetic
    tables give every customer at least one order, so the anti-join
    predicate filters on priority to stay non-degenerate).

    Engine-parity: the average threshold is computed as an exact scaled-
    integer sum (c_acctbal is 2-dp) so the > comparison never flips on a
    partial-agg-order-dependent double between engines."""
    codes = [1, 3, 5, 7, 9]
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
        "c_acctbal",
    )
    sel = cust.filter(F.col("cntrycode").isin(codes))
    threshold = sel.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            / 100.0
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    wealthy = sel.join(
        F.broadcast(threshold), F.col("c_acctbal") > F.col("avg_bal")
    ).join(urgent, sel.c_custkey == urgent.o_custkey, "left_anti")
    return (
        wealthy.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


WEALTHY_INACTIVE_ORACLE = """
WITH sel AS (
  SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
  FROM customer WHERE (c_nationkey % 10) IN (1, 3, 5, 7, 9)
), t AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / count(*)
           AS avg_bal
  FROM sel WHERE c_acctbal > 0
)
SELECT cntrycode,
       count(*) AS numcust,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM sel, t
WHERE c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = sel.c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
"""


def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. Two broadcast copies of nation (supplier side / customer side);
    the only big shuffle is lineitem x orders on the order key; the
    nation-pair disjunction rides the joined row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


NATION_VOLUME_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       {sql_pround("sum(l_extendedprice * (1 - l_discount))", 2)} AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
ORDER BY supp_nation, cust_nation, ship_year
"""


def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of PROMO-part order volume into
    region AMERICA, per order year — a conditional-sum ratio over a
    snowflake join. All dims broadcast; one agg shuffle on the year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            pround(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_pround(
           "sum(CASE WHEN n2.n_name = 'NATION_5' "
           "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
           "/ sum(l_extendedprice * (1 - l_discount))", 4)} AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
GROUP BY CAST(year(o_orderdate) AS INT)
ORDER BY o_year
"""


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarterly revenue, return the
    supplier(s) hitting the global maximum. The max is computed as a
    1-row aggregate of the (already tiny) per-supplier relation and
    broadcast back — no single-partition window, no second lineitem
    scan. Equality compares pround-quantized values, bit-identical on
    both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        pround(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {sql_pround("sum(l_extendedprice * (1 - l_discount))", 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


QUERIES = {
    "orders_with_returns": Query(
        orders_with_returns, ORDERS_RETURNS_ORACLE, "EXISTS semi-join"
    ),
    "customer_order_distribution": Query(
        customer_order_distribution,
        CUSTOMER_DISTRIBUTION_ORACLE,
        "Q13: outer join + count distribution",
    ),
    "wealthy_inactive_customers": Query(
        wealthy_inactive_customers,
        WEALTHY_INACTIVE_ORACLE,
        "Q22: scalar subquery threshold + anti join",
    ),
    "segment_set_ops": Query(
        segment_set_ops, SEGMENT_SET_OPS_ORACLE, "INTERSECT / EXCEPT ALL"
    ),
    "part_string_functions": Query(
        part_string_functions, PART_STRING_ORACLE, "string function family"
    ),
    "orders_date_functions": Query(
        orders_date_functions, ORDERS_DATE_ORACLE, "date/time function family"
    ),
    "lineitem_math_functions": Query(
        lineitem_math_functions, LINEITEM_MATH_ORACLE, "math function family"
    ),
    "min_cost_parts": Query(
        min_cost_parts, MIN_COST_ORACLE, "correlated aggregate subquery"
    ),
    "customer_order_arrays": Query(
        customer_order_arrays, CUSTOMER_ARRAYS_ORACLE, "array function family"
    ),
    "top_return_customers": Query(
        top_return_customers, TOP_RETURNS_ORACLE, "Q10: top-k over joined agg"
    ),
    "priority_ship_stats": Query(
        priority_ship_stats, PRIORITY_SHIP_ORACLE, "Q12: conditional aggregation"
    ),
    "promo_revenue_pct": Query(
        promo_revenue_pct, PROMO_REVENUE_ORACLE, "Q14: conditional-sum ratio"
    ),
    "disjunctive_filter_revenue": Query(
        disjunctive_filter_revenue, DISJUNCTIVE_ORACLE, "Q19: disjunctive predicates"
    ),
    "revenue_cube": Query(revenue_cube, REVENUE_CUBE_ORACLE, "CUBE grouping sets"),
    "order_gaps_quartiles": Query(
        order_gaps_quartiles, ORDER_GAPS_ORACLE, "lag/lead/ntile window family"
    ),
    "part_measures_unpivot": Query(
        part_measures_unpivot, PART_UNPIVOT_ORACLE, "unpivot (melt)"
    ),
    "nation_volume_shipping": Query(
        nation_volume_shipping, NATION_VOLUME_ORACLE, "Q7: bilateral volume by year"
    ),
    "market_share_by_year": Query(
        market_share_by_year, MARKET_SHARE_ORACLE, "Q8: market-share ratio by year"
    ),
    "top_revenue_supplier": Query(
        top_revenue_supplier, TOP_SUPPLIER_ORACLE, "Q15: argmax over grouped agg"
    ),
    "big_basket_orders": Query(
        big_basket_orders, BIG_BASKET_ORACLE, "Q18: HAVING + join-back"
    ),
}
