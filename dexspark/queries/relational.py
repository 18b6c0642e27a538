"""Relational family: the TPC-H sweep (Q1-Q22 shapes) plus windowed
sessionization, rollups, set ops, and UDAF/UDTF medians/trigrams."""

from __future__ import annotations
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import _parse_datatype_string
from dexspark.cdc.apply import apply_changes
from dexspark.lake.table import LakeTable

from dexspark.queries._common import (  # noqa: F401
    ORACLE_LANG,
    load,
)


# Money columns are doubles with exactly 2 decimal digits; per-row
# round(x*100) recovers exact integer cents identically in both engines
# (IEEE multiply is deterministic; a product that prints as x.5 IS the
# representable x.5, and both engines round it away from zero), after
# which every aggregate is exact int64 arithmetic — the scaled-integer
# discipline the driver hash-compares reliably (decimal SUM widens
# precision differently per engine and tripped the round-1 hash).
def _cents(c: str) -> "F.Column":
    return F.round(F.col(c) * 100).cast("long")


_CENTS_SQL = "CAST(round({col} * 100) AS BIGINT)"


# DuckDB widens SUM(BIGINT) to HUGEINT, which surfaces through Arrow as
# decimal128(38,0); Spark's long sums are int64. The driver hashes typed
# values, so every oracle SUM must be cast back to BIGINT or equal numbers
# hash differently (root cause of the six round-2 hash_match:false rows).
_SUM_BIGINT = "CAST(sum({expr}) AS BIGINT)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("sum_qty_x100"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_price_x100"),
            F.sum(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
            ).alias("sum_disc_price_x10000"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_quantity'))} AS sum_qty_x100,
  {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_extendedprice'))} AS sum_base_price_x100,
  {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_extendedprice')
      + ' * (100 - ' + _CENTS_SQL.format(col='l_discount') + ')')} AS sum_disc_price_x10000,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


_REVENUE_X10000 = (
    f"CAST(sum({_CENTS_SQL.format(col='l_extendedprice')}"
    f" * (100 - {_CENTS_SQL.format(col='l_discount')})) AS BIGINT)"
    f" AS revenue_x10000"
)


def _revenue_x10000() -> "F.Column":
    return F.sum(
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    ).alias("revenue_x10000")


def q3_revenue_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        cu.filter(F.col("c_mktsegment") == "BUILDING")
        .join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_revenue_x10000())
    )


ORACLE_Q3 = f"""
SELECT o_orderkey, o_orderdate, {_REVENUE_X10000}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
"""


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume per nation through a 5-way join. Only the true dims
    (supplier, nation — bounded cardinality) get a broadcast hint;
    customer grows with the fact data, so it is left to AQE, which
    broadcasts it when small and shuffle-joins it at scale (a forced
    hint there would OOM executors at 100×)."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            _revenue_x10000(),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q5 = f"""
SELECT n_name, {_REVENUE_X10000},
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q4_order_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery → LEFT SEMI hash join. Orders
    with at least one heavily-discounted line item, counted per
    priority. The semi-join probes once per order and never widens the
    row — the right plan for an existence test at any scale."""
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    disc = li.filter(F.col("l_discount") >= 0.08).select("l_orderkey")
    return (
        od.join(disc, od.o_orderkey == disc.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.08)
GROUP BY o_orderpriority
"""


def q17_small_quantity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate comparison
    (l_quantity < 0.2 * avg per part), decorrelated into an aggregate
    join. The fractional comparison is done in EXACT integer form —
    qty_c * 5 * n < sum_qty_c ⟺ qty < sum/(5n) — so no float average
    ever decides a boundary row differently across engines. The
    per-part aggregate is orders of magnitude smaller than lineitem;
    AQE broadcasts it."""
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_quantity")).alias("_sum_qty_c"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = li.join(per_part, "l_partkey")
    small = j.filter(
        _cents("l_quantity") * F.lit(5) * F.col("_n") < F.col("_sum_qty_c")
    )
    return small.agg(
        F.sum(_cents("l_extendedprice")).alias("sum_price_x100"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_Q17 = f"""
WITH pp AS (
  SELECT l_partkey,
         sum({_CENTS_SQL.format(col='l_quantity')}) AS sum_qty_c,
         count(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_extendedprice'))} AS sum_price_x100,
       count(*) AS n_rows
FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey
WHERE {_CENTS_SQL.format(col='l_quantity')} * 5 * pp.n < pp.sum_qty_c
"""


def q13_customer_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join (customers with zero orders
    must appear) → per-customer count → count-of-counts histogram.
    Exercises the null-preserving outer join + double aggregation
    pattern; both aggregates are map-side-combinable and the second
    input (one row per customer) is tiny, so the plan is two hash
    aggregates with no sort."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1-")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q13 = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN (
    SELECT * FROM orders WHERE o_orderpriority NOT LIKE '1-%'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
"""


def q18_large_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY ... HAVING on the big fact table
    feeding a semi-join filter (orders whose total quantity exceeds a
    threshold), then enrich + total-order. The HAVING aggregate is the
    only full-lineitem pass; its survivors are a tiny set that
    broadcasts into the enrichment joins. Quantities compare in exact
    cents (x100) so no float boundary row differs across engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("sum_qty_x100"))
        .filter(F.col("sum_qty_x100") > 21_000)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            _cents("o_totalprice").alias("o_totalprice_x100"),
            "sum_qty_x100",
        )
        .orderBy(F.col("o_totalprice_x100").desc(), "o_orderdate", "o_orderkey")
        .limit(20)
    )


ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey,
         {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_quantity'))} AS sum_qty_x100
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty_x100 > 21000
)
SELECT c.c_name, c.c_custkey, b.l_orderkey AS o_orderkey, o.o_orderdate,
       {_CENTS_SQL.format(col='o.o_totalprice')} AS o_totalprice_x100,
       b.sum_qty_x100
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice_x100 DESC, o.o_orderdate, o_orderkey
LIMIT 20
"""


def q7_trade_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under
    different roles — customer nation vs supplier nation — with a
    disjunctive pair filter and a derived grouping key (ship year).
    Both nation role-copies broadcast (25 rows each); the pair filter
    runs AFTER both joins so Catalyst can push each equi-join
    independently and evaluate the OR against in-row columns, never a
    cartesian."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    cn = na.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = na.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    a, b = "NATION_1", "NATION_2"
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), su.s_nationkey == F.col("s_nk"))
        .filter(
            ((F.col("cust_nation") == a) & (F.col("supp_nation") == b))
            | ((F.col("cust_nation") == b) & (F.col("supp_nation") == a))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue_x10000())
    )


ORACLE_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year, {_REVENUE_X10000}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
   OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
"""


def q10_returned_items_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a
    quarter — fact filter → 3-way join → group → total-ordered top 20.
    Revenue ties break on c_custkey so the LIMIT boundary is
    deterministic across engines."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    lo = F.lit("2000-01-01").cast("timestamp")
    hi = F.lit("2000-04-01").cast("timestamp")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            od.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            li.l_orderkey == od.o_orderkey,
        )
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue_x10000())
        .orderBy(F.col("revenue_x10000").desc(), "c_custkey")
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name, {_REVENUE_X10000}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_x10000 DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over
    a fact-dim join — promo revenue share for one month. Returned as
    exact numerator/denominator in fixed point (the ratio is a
    driver-side division; cross-engine float division would make the
    hash depend on libm)."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part")
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    lo = F.lit("2000-06-01").cast("timestamp")
    hi = F.lit("2000-07-01").cast("timestamp")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
            ).alias("promo_x10000"),
            F.sum(rev).alias("total_x10000"),
        )
    )


_REV_EXPR_SQL = (
    f"{_CENTS_SQL.format(col='l_extendedprice')}"
    f" * (100 - {_CENTS_SQL.format(col='l_discount')})"
)


ORACLE_Q14 = f"""
SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_EXPR_SQL} ELSE 0 END)
       AS BIGINT) AS promo_x10000,
  {_SUM_BIGINT.format(expr=_REV_EXPR_SQL)} AS total_x10000
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-07-01 00:00:00'
"""


def q16_supplier_part_cnt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attribute group with a
    NOT IN blacklist subquery (suppliers in bad standing) → left ANTI
    join before the distinct aggregate. The anti-join side is tiny and
    broadcasts; the distinct agg is the only shuffle (partial
    de-duplication map-side)."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    bad = su.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(
            F.broadcast(pa.filter(F.col("p_size").isin(1, 9, 19, 29, 49))),
            li.l_partkey == pa.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 9, 19, 29, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q19_disjunctive_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: one equi-join under a 3-way DISJUNCTION of
    brand/size/quantity band predicates. The join key (l_partkey =
    p_partkey) is common to every disjunct, so Catalyst keeps a single
    hash join and evaluates the OR as a post-join filter — the classic
    Q19 plan trap (a naive engine ORs the join itself into a
    cartesian). Plan-shape is asserted in tests/test_physical_plans.py.
    Quantities compare in exact cents."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part")
    q = _cents("l_quantity")

    def band(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & q.between(q_lo * 100, q_hi * 100)
        )

    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(
            band("Brand#1", 1, 15, 1, 20)
            | band("Brand#2", 10, 30, 10, 35)
            | band("Brand#3", 20, 50, 20, 50)
        )
        .agg(_revenue_x10000(), F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_Q19 = f"""
SELECT {_REVENUE_X10000}, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND {_CENTS_SQL.format(col='l_quantity')} BETWEEN 100 AND 2000)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND {_CENTS_SQL.format(col='l_quantity')} BETWEEN 1000 AND 3500)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND {_CENTS_SQL.format(col='l_quantity')} BETWEEN 2000 AND 5000)
"""


def q8_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a national supplier's share of regional order
    volume by year — a 6-way join where ONE side of a conditional sum
    depends on a dimension attribute (supplier nation), the classic
    numerator-inside-the-aggregate pattern. Share is returned as exact
    fixed-point numerator/denominator per year (cross-engine float
    division would put libm in the hash)."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re_ = load(spark, sf_dir, "region")
    cn = na.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = na.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), su.s_nationkey == F.col("s_nk"))
        .join(
            F.broadcast(re_.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == re_.r_regionkey,
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
                    F.lit(0)
                )
            ).alias("nation_volume_x10000"),
            F.sum(rev).alias("total_volume_x10000"),
        )
    )


ORACLE_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV_EXPR_SQL} ELSE 0 END)
       AS BIGINT) AS nation_volume_x10000,
  {_SUM_BIGINT.format(expr=_REV_EXPR_SQL)} AS total_volume_x10000
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY o_year
"""


def q9_product_type_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: revenue by supplier nation × order year for one
    product line — fact × part-dim filter × supplier-dim × date-derived
    key. The part filter broadcasts and prunes the fact rows before the
    wide joins; the two-level grouping key mixes a dimension attribute
    with a derived expression."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    pa = load(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(pa.filter(F.col("p_type") == "ECONOMY")),
            li.l_partkey == pa.p_partkey,
        )
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_revenue_x10000(), F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {_REVENUE_X10000}, count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY supp_nation, o_year
"""


def q2_min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: a correlated scalar MIN subquery (cheapest
    regional offer per part) decorrelated into an aggregate + equality
    join-back, ties preserved. The testdata has no partsupp table, so
    the offer relation is derived from lineitem: supplier s "offers"
    part p at the minimum extended price they ever shipped it for
    (exact cents — no float boundary rows). Plan shape: the offer
    relation aggregates once per (part, supplier), its per-part MIN is
    orders of magnitude smaller and broadcasts back; supplier/nation/
    region dims all broadcast."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re_ = load(spark, sf_dir, "region")
    pa = load(spark, sf_dir, "part")
    region_supp = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(
            F.broadcast(re_.filter(F.col("r_name") == "EUROPE")),
            na.n_regionkey == re_.r_regionkey,
        )
        .select("s_suppkey", "s_name", _cents("s_acctbal").alias("s_acctbal_x100"), "n_name")
    )
    offers = (
        li.join(F.broadcast(region_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal_x100", "n_name")
        .agg(F.min(_cents("l_extendedprice")).alias("cost_x100"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("_bp")).agg(
        F.min("cost_x100").alias("_min_cost")
    )
    small_parts = pa.filter(F.col("p_size") <= 5).select("p_partkey", "p_name")
    return (
        offers.join(
            F.broadcast(best),
            (offers.l_partkey == F.col("_bp"))
            & (offers.cost_x100 == F.col("_min_cost")),
        )
        .join(small_parts, offers.l_partkey == small_parts.p_partkey)
        .select(
            "s_acctbal_x100", "s_name", "n_name", "p_partkey", "p_name", "cost_x100"
        )
        .orderBy(
            F.col("s_acctbal_x100").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


ORACLE_Q2 = f"""
WITH offers AS (
  SELECT l_partkey, s.s_suppkey, s.s_name,
         {_CENTS_SQL.format(col='s.s_acctbal')} AS s_acctbal_x100, n.n_name,
         CAST(min({_CENTS_SQL.format(col='l_extendedprice')}) AS BIGINT) AS cost_x100
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l_partkey, s.s_suppkey, s.s_name, s_acctbal_x100, n.n_name
), best AS (
  SELECT l_partkey AS bp, min(cost_x100) AS min_cost FROM offers GROUP BY l_partkey
)
SELECT o.s_acctbal_x100, o.s_name, o.n_name, p.p_partkey, p.p_name, o.cost_x100
FROM offers o
JOIN best b ON o.l_partkey = b.bp AND o.cost_x100 = b.min_cost
JOIN part p ON o.l_partkey = p.p_partkey
WHERE p.p_size <= 5
ORDER BY o.s_acctbal_x100 DESC, o.n_name, o.s_name, p.p_partkey
LIMIT 100
"""


def q11_important_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: GROUP BY ... HAVING against a scalar fraction
    of the GLOBAL aggregate over the same relation — the classic
    "share of total" decorrelation: one grouped pass, one re-aggregate
    of its (tiny) output for the total, broadcast scalar join, exact
    integer threshold (value * 1000 > total ⟺ value > total/1000, no
    float division). Restricted to one nation's suppliers, as in the
    original."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    nat_supp = (
        su.join(
            F.broadcast(na.filter(F.col("n_name") == "NATION_11")),
            su.s_nationkey == na.n_nationkey,
        ).select("s_suppkey")
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("value_x10000"))
    )
    total = per_part.agg(F.sum("value_x10000").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_x10000") * F.lit(1000) > F.col("_total"))
        .select("l_partkey", "value_x10000")
        .orderBy(F.col("value_x10000").desc(), "l_partkey")
    )


ORACLE_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum({_CENTS_SQL.format(col='l_extendedprice')}
                  * (100 - {_CENTS_SQL.format(col='l_discount')})) AS BIGINT)
           AS value_x10000
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_11'
  GROUP BY l_partkey
)
SELECT l_partkey, value_x10000
FROM per_part
WHERE value_x10000 * 1000 > (SELECT CAST(sum(value_x10000) AS BIGINT) FROM per_part)
ORDER BY value_x10000 DESC, l_partkey
"""


def q12_priority_class_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-to-fact join feeding DUAL conditional
    counters (CASE WHEN inside SUM) grouped by a derived key. The
    original splits by ship mode and commit/receipt lateness; the
    testdata carries neither column, so the derived key is ship YEAR
    and the split is urgent (1-URGENT / 2-HIGH) vs other order
    priority — same plan: one equi-join, one hash aggregate, both
    counters map-side combinable, no second pass."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


ORACLE_Q12 = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY ship_year
ORDER BY ship_year
"""


def q15_top_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view aggregated per supplier over a
    quarter, then the supplier(s) achieving the GLOBAL MAX — the view
    + scalar-max + equality join-back pattern (ties kept, as the spec
    requires). Exact fixed-point revenue so the max comparison is
    integer equality; the per-supplier view re-aggregates to one row
    for the max and broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    view = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_revenue_x10000"))
    )
    top = view.agg(F.max("total_revenue_x10000").alias("_max_rev"))
    return (
        view.join(F.broadcast(top))
        .filter(F.col("total_revenue_x10000") == F.col("_max_rev"))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .select(
            F.col("s_suppkey"), "s_name", "total_revenue_x10000"
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum({_CENTS_SQL.format(col='l_extendedprice')}
                  * (100 - {_CENTS_SQL.format(col='l_discount')})) AS BIGINT)
           AS total_revenue_x10000
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_x10000
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_x10000 = (SELECT max(total_revenue_x10000) FROM revenue)
ORDER BY s_suppkey
"""


def q20_dominant_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a nested aggregate-threshold subquery deciding
    a SEMI-join chain up to suppliers. The original compares stock
    against half the shipped quantity (partsupp is absent here), so
    the adapted threshold is supply dominance: keep (part, supplier)
    pairs where the supplier shipped MORE than half that part's 1997
    volume (2*pair > part total — exact integers), for small parts,
    then semi-join suppliers. Plan: one grouped pass over the filtered
    fact, its per-part total derived from the SAME grouped output
    (rollup reuse, no second fact scan), broadcast dims, LEFT SEMI to
    dedup suppliers."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    pa = load(spark, sf_dir, "part")
    li97 = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    small = pa.filter(F.col("p_type") == "SMALL").select("p_partkey")
    pair_qty = (
        li97.join(F.broadcast(small), li97.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).alias("pair_qty_x100"))
    )
    part_qty = pair_qty.groupBy(F.col("l_partkey").alias("_pp")).agg(
        F.sum("pair_qty_x100").alias("part_qty_x100")
    )
    dominant = (
        pair_qty.join(F.broadcast(part_qty), pair_qty.l_partkey == F.col("_pp"))
        .filter(F.col("pair_qty_x100") * F.lit(2) > F.col("part_qty_x100"))
        .select("l_suppkey")
    )
    return (
        su.join(dominant, su.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", _cents("s_acctbal").alias("s_acctbal_x100"))
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = f"""
WITH pair_qty AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum({_CENTS_SQL.format(col='l_quantity')}) AS BIGINT) AS pair_qty_x100
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
), part_qty AS (
  SELECT l_partkey AS pp, CAST(sum(pair_qty_x100) AS BIGINT) AS part_qty_x100
  FROM pair_qty GROUP BY l_partkey
)
SELECT s_suppkey, s_name, {_CENTS_SQL.format(col='s_acctbal')} AS s_acctbal_x100
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pair_qty JOIN part_qty ON l_partkey = pp
  WHERE pair_qty_x100 * 2 > part_qty_x100)
ORDER BY s_suppkey
"""


def q21_waiting_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact
    table — suppliers who were the ONLY problem supplier on a
    multi-supplier finalized order. The testdata has no commit/receipt
    dates, so "problem" is l_returnflag='R' (returned): for each R
    line on an 'F' order, EXISTS another supplier on the order (semi
    join) and NOT EXISTS another supplier who ALSO returned (anti
    join). Both self-joins hash on l_orderkey with the supplier
    inequality as a residual filter — never a cartesian; supplier dim
    broadcasts for the final name lookup."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    su = load(spark, sf_dir, "supplier")
    f_orders = od.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(f_orders, li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "l_linenumber")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("_ok2")) & (l1.l_suppkey != F.col("_sk2")),
            "left_semi",
        ).join(
            l3,
            (l1.l_orderkey == F.col("_ok3")) & (l1.l_suppkey != F.col("_sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(su), waiting.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


ORACLE_Q21 = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_dormant_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (average positive
    balance) gating the outer scan, plus NOT EXISTS (no orders in the
    final year) → broadcast scalar + left ANTI join. The average
    compares on exact cents (sum/count of int64 divides identically in
    both engines' float64)."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    cents = _cents("c_acctbal")
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        F.avg(cents).alias("_avg")
    )
    recent = od.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cu.withColumn("acctbal_x100", cents)
        .join(F.broadcast(avg_bal))
        .filter(F.col("acctbal_x100") > F.col("_avg"))
        .join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("acctbal_x100").alias("totacctbal_x100"),
        )
    )


ORACLE_Q22 = f"""
SELECT c_nationkey, count(*) AS numcust,
       {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='c_acctbal'))} AS totacctbal_x100
FROM customer
WHERE {_CENTS_SQL.format(col='c_acctbal')} >
      (SELECT avg({_CENTS_SQL.format(col='c_acctbal')})
       FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_nationkey
"""


def user_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the event stream (window
    functions — absent from the reference, supplied by Spark, SURVEY
    §2.2): a >30-minute gap starts a new session; per user report
    session count and the longest session's event count.

    Plan shape: one shuffle on user_id serves BOTH window passes and
    the final aggregate (same partitioning reused across stages)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")  # ts is NTZ in parquet
    gap = secs - F.lag(secs).over(w)
    with_start = ev.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = with_start.withColumn(
        "session_id", F.sum("_new_session").over(w)
    )
    per_session = with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


ORACLE_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS session_id
  FROM g
), per AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
FROM per GROUP BY user_id
"""


def revenue_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage (SURVEY §2.2 gap list): ROLLUP over
    (returnflag, linestatus) with grouping ids — subtotals and grand
    total in one pass (partial aggregation per grouping set)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("sum_qty_x100"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty_x100",
            "n_rows",
        )
    )


ORACLE_ROLLUP = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_SUM_BIGINT.format(expr=_CENTS_SQL.format(col='l_quantity'))} AS sum_qty_x100,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def top_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort/limit (top-k) coverage: 10 highest-revenue customers.
    Plan: partial agg per customer, then TakeOrderedAndProject — the
    k-bounded reduce means no global sort ever materializes."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(_revenue_x10000())
    )
    return (
        rev.orderBy(F.col("revenue_x10000").desc(), F.col("o_custkey").asc())
        .limit(10)
        .select(F.col("o_custkey").alias("custkey"), "revenue_x10000")
    )


ORACLE_TOP_CUSTOMERS = f"""
SELECT o_custkey AS custkey, {_REVENUE_X10000}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY revenue_x10000 DESC, custkey ASC
LIMIT 10
"""


def q6_forecast_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single global aggregate. All
    three predicates push into the parquet scan; the aggregate is a
    two-stage partial/final with no grouping key."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(20,4)"
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,4)))
            AS DECIMAL(20,4)) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def churned_buyers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage (SURVEY §2.2 gap list): users who
    purchased early but never again — EXCEPT (DISTINCT) over the event
    stream. Plans as a left-anti hash join, not a sort-based set op."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25").cast("timestamp")
    early = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("ts") < cutoff)
    ).select("user_id")
    late = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("ts") >= cutoff)
    ).select("user_id")
    return early.subtract(late)


ORACLE_CHURNED = """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-25'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-25'
"""


def purchase_asof_view_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator Spark lacks; DuckDB has ASOF JOIN):
    each purchase event enriched with the user's most recent view
    event at or before it. Views are pre-deduped to max event per
    (user, ts) so ties are deterministic in both engines. Plan: union +
    one key-partitioned window — no join operator, one shuffle."""
    from dexspark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event"))
    )
    out = asof_join(purchases, views, on="ts", by="user_id")
    return out.select(
        "user_id", "event_id", F.col("view_event_r").alias("view_event")
    )


ORACLE_ASOF = """
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_event
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, v.view_event
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def lang_length_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface (SURVEY §2.3): an Arrow grouped-aggregate
    pandas UDF (median of doc lengths per predicted language) — the
    vectorized path for aggregates Spark lacks built-in. Partial
    aggregation does NOT apply to grouped-agg pandas UDFs (full groups
    must colocate), which is exactly why built-ins are preferred when
    they exist; this query is the extension-point demonstration."""
    from pyspark.sql.functions import pandas_udf

    from dexspark.functions.text import lang_id

    @pandas_udf("double")
    def median_len(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("long")
    def n_vals(v: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with built-in aggregates
        # in one agg() — the count rides the same Arrow batch instead
        return int(len(v))

    docs = lang_id(load(spark, sf_dir, "documents"))
    lens = F.col("n_chars").cast("double")
    return docs.groupBy("lang_pred").agg(
        median_len(lens).alias("median_chars"),
        n_vals(lens).alias("n_docs"),
    )


def _oracle_lang_median() -> str:
    return f"""
WITH lang AS ({ORACLE_LANG})
SELECT lang_pred,
       median(CAST(n_chars AS DOUBLE)) AS median_chars,
       COUNT(*) AS n_docs
FROM lang JOIN documents USING (doc_id)
GROUP BY lang_pred
"""


def top_trigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDTF surface (SURVEY §2.3): a Python table function
    (1 row → N rows) invoked via LATERAL — the reference's
    'register another function as a step' extension point, as Spark 4's
    UDTF. Top-20 corpus trigrams, ties broken lexicographically."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram string")
    class Trigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").strip().lower().split() if t]
            for i in range(len(toks) - 2):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("dexspark_trigrams", Trigrams)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_docs_tri")
    return spark.sql(
        """
        SELECT t.ngram, count(*) AS n
        FROM _docs_tri, LATERAL dexspark_trigrams(text) t
        GROUP BY t.ngram
        ORDER BY n DESC, ngram ASC
        LIMIT 20
        """
    )


ORACLE_TRIGRAMS = """
WITH toks AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), tri AS (
  SELECT unnest([array_to_string(w[i+1:i+3], ' ')
                 for i in range(0, len(w)-2)]) AS ngram
  FROM toks
)
SELECT ngram, COUNT(*) AS n
FROM tri GROUP BY ngram
ORDER BY n DESC, ngram ASC
LIMIT 20
"""
