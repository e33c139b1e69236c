"""Remaining TPC-H query shapes (Q6, Q9, Q16, Q17, Q21) over the driver's
star schema.

Completes the TPC-H shape sweep started in relational.py /
relational_ext.py: with these (and the Q11-shape
``q11_important_parts`` added in round 5), every TPC-H query pattern
expressible on the available tables (no partsupp, no commit/receipt
dates) has an engine query — Q2/Q20 are partsupp-centric and their core
patterns (correlated min, nested semi-join) are covered by
min_cost_parts and decontaminate_ngram respectively.

Float parity uses the house rules (functions/rounding.py + quantized
integer sums): per-row doubles are IEEE-identical on both engines, so
quantize-at-row -> exact BIGINT sum -> divide/round is
aggregation-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tower_parse_spark.functions.rounding import pround, sql_pround
from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table


def _q4(col: F.Column) -> F.Column:
    """Exact 4-dp integer quantization pre-sum (same as relational_ext)."""
    return F.floor(col * 10000.0 + F.lit(0.5)).cast("long")


def _sql_q4(expr: str) -> str:
    return f"CAST(floor(({expr}) * 10000.0 + 0.5) AS BIGINT)"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filtered aggregate — the pure
    scan-predicate-pushdown query. Every predicate reaches the parquet
    scan (PushedFilters); no joins, no shuffle past the 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        (
            F.sum(_q4(F.col("l_extendedprice") * F.col("l_discount"))) / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_ORACLE = f"""
SELECT sum({_sql_q4("l_extendedprice * l_discount")}) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-join profit rollup by (nation, order year).
    partsupp doesn't exist in this schema, so supply cost is modeled as
    a per-unit constant (100/unit) — the join/agg topology is Q9's:
    fact x orders shuffle join, part filter + supplier/nation broadcast,
    one agg shuffle on (nation, year)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        100.0
    ) * F.col("l_quantity")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(_q4(amount)) / 10000.0).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       sum({_sql_q4(
           "l_extendedprice * (1 - l_discount) - 100.0 * l_quantity")})
         / 10000.0 AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    with an anti-join exclusion list (suppliers in deficit stand in for
    the complaint-comment exclusion; partsupp stands in as the observed
    lineitem part-supplier pairs). Count-distinct over a de-duplicated
    pair relation — one shuffle on the pair, one on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#1"
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .dropDuplicates()
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = ps.l_suppkey AND s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average-quantity threshold (correlated
    aggregate subquery) gating a global sum. The per-part averages are
    PART-cardinality (grows with SF — millions of rows at SF100), so
    the threshold join carries no broadcast hint: AQE broadcasts it at
    small SF and falls back to a shuffle join when it outgrows the
    threshold (r12 scale sweep; a hard hint here was a driver OOM at
    scale). The compare uses exact scaled integers (20% of a sum of
    2-dp quantities) so the inequality never flips between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#2"
    )
    q100 = F.round(F.col("l_quantity") * 100).cast("long")
    avgs = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(q100).alias("sq100"), F.count(F.lit(1)).alias("nq")
        )
        .select("l_partkey", "sq100", "nq")
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    sel = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avgs, F.col("l_partkey") == F.col("t_partkey"))
        # l_quantity < 0.2 * avg(qty), in exact integers:
        # q100 < sq100 / (5 * nq)  <=>  q100 * nq * 5 < sq100
        .filter(q100 * F.col("nq") * 5 < F.col("sq100"))
    )
    return sel.agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            / 100.0
            / 7.0
        ).alias("avg_yearly")
    )


Q17_ORACLE = """
WITH sel AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
), t AS (
  SELECT l_partkey AS t_partkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq100,
         count(*) AS nq
  FROM sel GROUP BY l_partkey
)
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
         AS avg_yearly
FROM sel JOIN t ON l_partkey = t_partkey
WHERE CAST(round(l_quantity * 100) AS BIGINT) * nq * 5 < sq100
"""


def q21_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact —
    suppliers whose lines were returned on multi-supplier orders where
    no co-supplier's line was returned (the original's late-delivery
    blame logic re-keyed to return flags; this schema has no
    commit/receipt dates). Plan: one de-duplicated (order, supplier,
    any_returned) relation; the per-order co-supplier stats come from
    an UNORDERED window over l_orderkey — partition-parallel, no
    second aggregation, no join. (A prior version broadcast a
    per-orderkey stats aggregate: ORDERS-cardinality, ~1.5B rows at
    SF100 — a driver OOM dressed as a broadcast hint; r12 scale
    sweep.) Semi and anti in one pass over grouped flags, never a
    correlated per-row probe."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    per = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret")
        )
    )
    w_order = W.partitionBy("l_orderkey")
    blamed = (
        per.withColumn("n_supp", F.count(F.lit(1)).over(w_order))
        .withColumn("n_ret_supp", F.sum("ret").over(w_order))
        # returned, multi-supplier order, and the ONLY supplier returned
        .filter(
            (F.col("ret") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_ret_supp") == 1)
        )
    )
    return (
        blamed.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


Q21_ORACLE = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, n_name AS nation, count(*) AS numwait
FROM per p
JOIN supplier ON p.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p.ret = 1
  AND EXISTS (SELECT 1 FROM per o
              WHERE o.l_orderkey = p.l_orderkey
                AND o.l_suppkey <> p.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM per o
                  WHERE o.l_orderkey = p.l_orderkey
                    AND o.l_suppkey <> p.l_suppkey AND o.ret = 1)
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
"""


#: Q11 adaptation knobs: the "national stock" nations and the
#: importance fraction as an exact RATIONAL (TPC-H uses 0.0001/SF over
#: partsupp; 1/1000 of the two-nation lineitem value keeps ~9% of parts
#: at sf0.01 — a non-degenerate HAVING cut). Kept as num/den integers
#: so the threshold compare is pure int64 arithmetic on BOTH engines:
#: `vu * den > tu * num` — a double comparison would go lossy once the
#: global total approaches 2^53 (sf>=1 territory) while DuckDB's
#: DECIMAL stays exact, flipping boundary parts between engines.
Q11_NATIONS = ["NATION_3", "NATION_7"]
Q11_FRAC_NUM = 1
Q11_FRAC_DEN = 1000


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group aggregate filtered against a GLOBAL
    aggregate of the same measure (HAVING sum(...) > fraction *
    sum-over-everything) — the group-share-threshold pattern, distinct
    from Q22's per-row scalar threshold.

    Plan: lineitem joins broadcast supplier/nation dims, one partkey
    agg, a 1-row total agg re-aggregated FROM the grouped relation (no
    second scan), then a broadcast one-row threshold join (same
    allowlisted shape as wealthy_inactive_customers). Value arithmetic
    is exact scaled-integer (price and discount are 2-dp) and the
    threshold compare is int64-vs-int64 (vu * den > tu * num — no
    doubles anywhere), so the cut can never flip on partial-agg order
    or on long->double precision at large scale factors."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(Q11_NATIONS)
    )
    vu = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    base = li.join(
        F.broadcast(sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)),
        li.l_suppkey == F.col("s_suppkey"),
    )
    grouped = base.groupBy("l_partkey").agg(F.sum(vu).alias("_vu"))
    total = grouped.agg(F.sum("_vu").alias("_tu"))
    return (
        grouped.join(
            F.broadcast(total),
            F.col("_vu") * F.lit(Q11_FRAC_DEN)
            > F.col("_tu") * F.lit(Q11_FRAC_NUM),
        )
        .select(
            "l_partkey",
            pround(F.col("_vu") / 10000.0, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


_Q11_NATION_LIST = ", ".join(f"'{n}'" for n in Q11_NATIONS)

Q11_ORACLE = f"""
WITH base AS (
  SELECT l.l_partkey,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vu
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ({_Q11_NATION_LIST})
), grouped AS (
  SELECT l_partkey, sum(vu) AS vu FROM base GROUP BY l_partkey
), tot AS (
  SELECT sum(vu) AS tu FROM grouped
)
SELECT l_partkey,
       {sql_pround("vu / 10000.0", 2)} AS part_value
FROM grouped, tot
WHERE vu * {Q11_FRAC_DEN} > tu * {Q11_FRAC_NUM}
ORDER BY part_value DESC, l_partkey
"""


QUERIES = {
    "q6_forecast_revenue": Query(
        q6_forecast_revenue, Q6_ORACLE, "Q6: pure pushdown filter agg"
    ),
    "q11_important_parts": Query(
        q11_important_parts,
        Q11_ORACLE,
        "Q11: group share vs global-aggregate threshold",
    ),
    "q9_product_profit": Query(
        q9_product_profit, Q9_ORACLE, "Q9: profit rollup by nation/year"
    ),
    "q16_supplier_counts": Query(
        q16_supplier_counts, Q16_ORACLE, "Q16: distinct counts + anti join"
    ),
    "q17_small_quantity_revenue": Query(
        q17_small_quantity_revenue,
        Q17_ORACLE,
        "Q17: correlated avg threshold",
    ),
    "q21_blame_suppliers": Query(
        q21_blame_suppliers, Q21_ORACLE, "Q21: exists + not-exists blame"
    ),
}
