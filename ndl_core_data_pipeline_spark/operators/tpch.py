"""Composite analytical queries (scan → filter → join → agg → sort) over the
synthetic star schema — the flagship end-to-end exercises of SURVEY §7.1.

Shapes follow TPC-H Q1/Q3/Q5 adapted to the testdata columns. These are the
bench headliners: Catalyst gets full latitude (pushdown through joins,
broadcast dims, partial aggs, TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ._util import davg, dsum, sql_davg, sql_dsum


def q1_pricing_summary(spark, sf_dir):
    """Q1 shape: full-scan groupBy with derived measures and a date
    predicate pushed to the parquet scan."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark, sf_dir):
    """Q3 shape: segment filter on a broadcast dim, fact-fact join, top-10
    revenue (TakeOrderedAndProject)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    """Q5 shape: five-way join (two broadcast dims) + per-nation revenue.
    The c_nationkey = s_nationkey condition keeps the TPC-H local-supplier
    semantics."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


def q6_forecast_revenue(spark, sf_dir):
    """Q6 shape: pure scan-side predicates + single aggregate — measures
    pushdown efficiency (no join, no shuffle beyond the final reduce)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * F.col("l_discount"), "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q4_priority_exists(spark, sf_dir):
    """Q4 shape: EXISTS correlated subquery — decorrelated to a left-semi
    join (Catalyst's own rewrite of EXISTS); order-priority distribution of
    orders having at least one returned lineitem."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q13_customer_distribution(spark, sf_dir):
    """Q13 shape: left outer join + two-level aggregation — distribution of
    customers by order count, zero-order customers included (the outer join
    is the point: an inner join would drop them)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """Q17 shape: correlated scalar-aggregate subquery (avg quantity per
    part), decorrelated to a pre-aggregation joined back on the correlation
    key — the scalable form of `l_quantity < (SELECT 0.2*avg(...) WHERE
    l2.l_partkey = l_partkey)`."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = l.groupBy("l_partkey").agg(
        (0.2 * davg(F.col("l_quantity"), "a")).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum(F.col("l_extendedprice"), "s") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING on a grouped sum + join back to the fact tables —
    customers whose single orders exceed 300 total quantity."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
    )


def q22_dormant_rich_customers(spark, sf_dir):
    """Q22 shape: uncorrelated scalar subquery (global average balance,
    broadcast) + anti-join against recent orders — per-nation count and
    balance of above-average customers with no 1998-H2 orders."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal"), "avg_bal")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            dsum(F.col("c_acctbal"), "total_bal"),
        )
    )


def register(reg):
    reg.add(
        "q1_pricing_summary",
        q1_pricing_summary,
        "SELECT l_returnflag, l_linestatus, "
        f"{sql_dsum('l_quantity')} AS sum_qty, "
        f"{sql_dsum('l_extendedprice')} AS sum_base_price, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge, "
        f"{sql_davg('l_quantity')} AS avg_qty, "
        f"{sql_davg('l_extendedprice')} AS avg_price, "
        f"{sql_davg('l_discount')} AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus",
    )
    reg.add(
        "q3_shipping_priority",
        q3_shipping_priority,
        "SELECT o_orderkey, o_orderdate, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1997-01-01' "
        "GROUP BY o_orderkey, o_orderdate "
        "ORDER BY revenue DESC, o_orderkey LIMIT 10",
    )
    reg.add(
        "q5_region_revenue",
        q5_region_revenue,
        "SELECT r_name, n_name, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue, "
        "COUNT(*) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE c_nationkey = s_nationkey "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1999-01-01' "
        "AND r_name IN ('EUROPE', 'ASIA') "
        "GROUP BY r_name, n_name",
    )
    reg.add(
        "q6_forecast_revenue",
        q6_forecast_revenue,
        "SELECT "
        f"{sql_dsum('l_extendedprice * l_discount')} AS revenue, "
        "COUNT(*) AS n_items FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24",
    )
    reg.add(
        "q4_priority_exists",
        q4_priority_exists,
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority",
    )
    reg.add(
        "q13_customer_distribution",
        q13_customer_distribution,
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderdate >= TIMESTAMP '1998-01-01' "
        "GROUP BY c_custkey) GROUP BY c_count",
    )
    reg.add(
        "q17_small_quantity_revenue",
        q17_small_quantity_revenue,
        "WITH thresh AS (SELECT l_partkey, "
        f"0.2 * {sql_davg('l_quantity')} AS qty_threshold "
        "FROM lineitem GROUP BY l_partkey) "
        f"SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly, "
        "COUNT(*) AS n_items "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN thresh USING (l_partkey) "
        "WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold",
    )
    reg.add(
        "q18_large_volume_customers",
        q18_large_volume_customers,
        "WITH big AS (SELECT l_orderkey, "
        f"{sql_dsum('l_quantity')} AS sum_qty "
        "FROM lineitem GROUP BY l_orderkey "
        f"HAVING {sql_dsum('l_quantity')} > 300) "
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty "
        "FROM big JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey",
    )
    reg.add(
        "q22_dormant_rich_customers",
        q22_dormant_rich_customers,
        "WITH avg_bal AS (SELECT "
        f"{sql_davg('c_acctbal')} AS avg_bal "
        "FROM customer WHERE c_acctbal > 0) "
        "SELECT c_nationkey, COUNT(*) AS n_custs, "
        f"{sql_dsum('c_acctbal')} AS total_bal "
        "FROM customer, avg_bal "
        "WHERE c_acctbal > avg_bal AND NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '1998-06-01') "
        "GROUP BY c_nationkey",
    )
