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
