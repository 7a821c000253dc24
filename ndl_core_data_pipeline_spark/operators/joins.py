"""Join operators (SURVEY §2.4 J1–J3 + full engine-surface join family).

Strategy notes for scale: dimension tables (region/nation/supplier) are
broadcast — no shuffle of the fact side. Fact-fact joins (orders⋈lineitem)
shuffle on the join key; at 100 TB these would be bucketed on orderkey so
the shuffle disappears. Non-equi joins are kept dimension×dimension sized
(BroadcastNestedLoopJoin is O(n·m)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load


def inner_equi_join(spark, sf_dir):
    """Inner equi-join chain customer⋈nation⋈region (engine surface; the
    reference's J2 metadata↔data association is this shape,
    assets/processing/assets.py:338-346)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


def left_join_coalesce(spark, sf_dir):
    """J1 tag-merge: left join predictions onto base, coalesce(pred, existing)
    (ref: assets/processing/assets.py:543-558)."""
    c = load(spark, sf_dir, "customer")
    preds = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") <= 1)
        .select("n_nationkey", F.col("n_name").alias("predicted_tag"))
    )
    return (
        c.join(F.broadcast(preds), c.c_nationkey == preds.n_nationkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("predicted_tag"), F.col("c_mktsegment")).alias("tag"),
        )
    )


def semi_join(spark, sf_dir):
    """Left-semi join: customers having at least one urgent open order
    (EXISTS shape; engine surface)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def anti_join_skip_existing(spark, sf_dir):
    """F8 skip-if-exists as anti-join: work-list minus already-materialized keys
    (ref: assets/gov_uk/assets.py:92-95 and 3 sibling crawlers)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def right_outer_join(spark, sf_dir):
    """Right outer join with nulls on the probe side (engine surface)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "2001-06-01")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "right")
        .select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")
    )


def full_outer_join(spark, sf_dir):
    """Full outer join supplier⟗nation (engine surface)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "full").select(
        "s_suppkey", "s_name", "n_nationkey", "n_name"
    )


def broadcast_join(spark, sf_dir):
    """Explicit broadcast-hash join: small dim never shuffles the fact side
    (engine surface; at 100 TB this is mandatory for dim joins)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
    )


def theta_range_join(spark, sf_dir):
    """Theta (non-equi range) join: parts priced within a supplier-derived
    band (engine surface; kept dim×dim sized — nested-loop is O(n·m))."""
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    return (
        p.join(
            F.broadcast(s),
            (p.p_retailprice >= s.s_acctbal / 10.0)
            & (p.p_retailprice < s.s_acctbal / 5.0),
        )
        .select("p_partkey", "s_suppkey", "p_retailprice", "s_acctbal")
    )


def asof_join_last_view(spark, sf_dir):
    """As-of join: for each purchase event, the most recent prior 'view' by
    the same user (engine surface — ordered-adjacency family of J3/W1).
    Implemented as a window carry-forward, not a join: one shuffle on
    user_id, no range-join explosion."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    return (
        ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .withColumn("last_view_id", F.last(view_id, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts", "last_view_id")
    )


def register(reg):
    reg.add(
        "join_inner_equi",
        inner_equi_join,
        "SELECT c_custkey, c_name, n_name, r_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey",
    )
    reg.add(
        "join_left_coalesce",
        left_join_coalesce,
        "SELECT c_custkey, COALESCE(n_name, c_mktsegment) AS tag FROM customer "
        "LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 1) p "
        "ON c_nationkey = p.n_nationkey",
    )
    reg.add(
        "join_semi",
        semi_join,
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')",
    )
    reg.add(
        "join_anti_skip_existing",
        anti_join_skip_existing,
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    )
    reg.add(
        "join_right_outer",
        right_outer_join,
        "SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity FROM "
        "(SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01') l "
        "RIGHT JOIN orders ON l.l_orderkey = o_orderkey",
    )
    reg.add(
        "join_full_outer",
        full_outer_join,
        "SELECT s_suppkey, s_name, n_nationkey, n_name FROM supplier "
        "FULL OUTER JOIN nation ON s_nationkey = n_nationkey",
    )
    reg.add(
        "join_broadcast",
        broadcast_join,
        "SELECT o_orderkey, c_name, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey",
    )
    reg.add(
        "join_theta_range",
        theta_range_join,
        "SELECT p_partkey, s_suppkey, p_retailprice, s_acctbal FROM part "
        "JOIN supplier ON p_retailprice >= s_acctbal/10.0 "
        "AND p_retailprice < s_acctbal/5.0",
    )
    reg.add(
        "join_asof_last_view",
        asof_join_last_view,
        "SELECT event_id, user_id, ts, last_view_ts, last_view_id FROM ("
        "SELECT event_id, user_id, ts, event_type, "
        "last_value(CASE WHEN event_type='view' THEN ts END IGNORE NULLS) OVER w AS last_view_ts, "
        "last_value(CASE WHEN event_type='view' THEN event_id END IGNORE NULLS) OVER w AS last_view_id "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ") t WHERE event_type = 'purchase'",
    )
