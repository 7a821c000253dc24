"""Pre-fix-failing pins for the round-19 ADVICE/verdict fixes.

(1) The nested-decimal NARROWING guard emitted DuckDB's native
decimal->decimal cast, which TRUNCATES on scale reduction where Spark
rounds HALF_UP (probed: 1.999 (4,3)->(3,2) is 1.99 in DuckDB, 2.00 in
Spark), and a value Spark rounds ACROSS the magnitude bound
(99999999.999 at (10,2) -> NULL) survived truncated in the oracle —
fixed by pre-rounding with DuckDB round(dec, s) (half-away-from-zero ==
HALF_UP) and bounding the ROUNDED value.  (2) The guard evaluates the
expr twice; for a volatile subexpression that is semantics-visible, so
it now refuses loudly (r18 verdict #7 lint option).  (3) dcast's comment
claimed NaN fails abs(x) >= 2^53 — wrong under Spark's NaN-greatest
ordering; the behavior pin (NaN/Inf stay NULL) now exists in code, not
just prose.  (4) FUZZY_SQL_CODEPOINT's bare substring replace would
also rewrite a future damerau_levenshtein identifier.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark.operators._util import (
    dcast,
    guard_nonfinite_decimal_casts,
)


def _narrowing_probe(spark, xs, sql_body, spark_body=None):
    """Run the same nested narrowing cast through Spark (non-ANSI, as
    engine sessions run) and through the guarded-oracle DuckDB form;
    return (spark_values, duck_values) in input order."""
    import duckdb

    g = guard_nonfinite_decimal_casts(sql_body)
    assert guard_nonfinite_decimal_casts(g) == g  # idempotent
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (i INTEGER, x DOUBLE)")
        for i, x in enumerate(xs):
            con.execute("INSERT INTO t VALUES (?, ?)", [i, x])
        rows = con.execute(f"SELECT {g} FROM t ORDER BY i").fetchall()
    finally:
        con.close()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    sdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i int, x double"
    ).selectExpr(f"{spark_body or sql_body} AS v", "i")
    got = [r["v"] for r in sdf.orderBy("i").collect()]
    return got, [r[0] for r in rows]


def test_narrowing_rounds_half_up_not_truncates(spark):
    """Scale-reducing nested cast: Spark rounds HALF_UP, so the oracle
    must too — the old native-cast emission truncated (1.999 -> 1.99)."""
    xs = [1.999, -1.995, 2.675, 1.994]
    got, want = _narrowing_probe(
        spark, xs, "CAST(CAST(x AS DECIMAL(20,3)) AS DECIMAL(10,2))"
    )
    assert got == want
    assert str(got[0]) == "2.00"  # the truncation would say 1.99
    assert str(got[1]) == "-2.00"  # half-away-from-zero on negatives


def test_narrowing_null_on_rounded_carry(spark):
    """A value whose HALF_UP rounding carries ACROSS the magnitude
    bound (99999999.999 -> 100000000.00 at (10,2)) must go NULL on both
    sides; the old pre-round guard admitted it truncated."""
    xs = [99999999.999, 99999999.994, 123456789.5]
    got, want = _narrowing_probe(
        spark, xs, "CAST(CAST(x AS DECIMAL(25,3)) AS DECIMAL(10,2))"
    )
    assert got == want
    assert got[0] is None  # rounded carry overflows (10,2)
    assert str(got[1]) == "99999999.99"  # just below the bound stays
    assert got[2] is None  # plain overflow


def test_narrowing_guard_refuses_volatile():
    """Double-evaluating a volatile expr inside the narrowing guard is
    semantics-visible (r18 verdict #7): refuse loudly."""
    with pytest.raises(ValueError, match="volatile"):
        guard_nonfinite_decimal_casts(
            "CAST(CAST(random() AS DECIMAL(25,6)) AS DECIMAL(10,2))"
        )


def test_dcast_nan_inf_stay_null(spark):
    """NaN passes abs(x) >= 2^53 under Spark's NaN-greatest ordering
    (the r18 comment claimed the opposite); it is excluded solely by
    abs(x) < bound. Pin the ordering fact and the NULL outcome for
    NaN/+Inf/-Inf so a future bound refactor cannot route NaN into the
    hi/lo decomposition silently."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),), (1.5,)],
        "x double",
    )
    # the ordering invariant the dcast comment relies on
    assert (
        df.filter(F.isnan("x"))
        .select((F.abs("x") >= F.lit(2.0**53)).alias("b"))
        .collect()[0]["b"]
        is True
    )
    vals = [
        r["v"]
        for r in df.select(
            dcast(F.col("x"), "decimal(25,6)").alias("v"),
            F.col("x"),
        )
        .orderBy("x")
        .collect()
    ]
    # orderBy double: -Inf, 1.5, Inf, NaN (NaN greatest)
    assert vals[0] is None and vals[2] is None and vals[3] is None
    assert str(vals[1]) == "1.500000"


def test_fuzzy_codepoint_rewrite_is_word_bounded():
    from ndl_core_data_pipeline_spark.operators import graphs

    assert "lev_cp(" in graphs.FUZZY_SQL_CODEPOINT
    assert not re.search(r"\blevenshtein\(", graphs.FUZZY_SQL_CODEPOINT)
    # the regex leaves other *_levenshtein identifiers alone where the
    # old substring replace would have minted damerau_lev_cp(
    assert (
        re.sub(r"\blevenshtein\(", "lev_cp(", "damerau_levenshtein(a, b)")
        == "damerau_levenshtein(a, b)"
    )


def test_pagerank_oracle_materializes_reused_ctes():
    from ndl_core_data_pipeline_spark.operators.graphs import _pagerank_sql

    sql = _pagerank_sql()
    # every multiply-referenced CTE is pinned MATERIALIZED so DuckDB
    # cannot re-run the items self-join per power iteration (the sf3
    # 79 GB oracle spill, PARITY_SF3_r18 residual)
    for cte in ("items", "edges", "sym", "deg", "nv"):
        assert f"{cte} AS MATERIALIZED (" in sql


def test_q11_total_is_exact_sum_of_part_partials(spark, sf_small):
    """r19: q11's nation-wide total derives from the checkpointed
    per-part DECIMAL partials instead of a second pass over the fact
    join. Decimal addition is exact and associative, so the derived
    total must equal the direct aggregate BITWISE (cast to double),
    including when some parts' values are NULL-only groups."""
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.operators._util import dsum

    l = load(spark, sf_small, "lineitem")
    s = load(spark, sf_small, "supplier")
    n = load(spark, sf_small, "nation").filter(F.col("n_name") == "NATION_3")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = l.join(s, l.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    direct = national.agg(dsum(value, "t")).collect()[0]["t"]
    from ndl_core_data_pipeline_spark.operators._util import DEC, dcast

    derived = (
        national.groupBy("l_partkey")
        .agg(F.sum(dcast(value, DEC)).alias("_pv"))
        .agg(F.sum("_pv").cast("double").alias("t"))
        .collect()[0]["t"]
    )
    assert derived == direct


def test_funnel_checkpoints_keep_stage_semantics(spark, sf_small):
    """r19: funnel's views/clicks lazy checkpoints must not change the
    row set or stages — spot-pin a user with all three stages and the
    anchor row count against a direct recomputation."""
    import __spark_entry__ as contract

    out = contract.queries()["events_funnel_steps"](spark, sf_small)
    rows = {r["user_id"]: r for r in out.collect()}
    from ndl_core_data_pipeline_spark.io import load

    ev = load(spark, sf_small, "events")
    n_view_users = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_view_users
    for r in rows.values():
        expected = (
            1
            + (r["click_ts"] is not None)
            + (r["purchase_ts"] is not None)
        )
        assert r["funnel_stage"] == expected
