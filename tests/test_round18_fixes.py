"""Pre-fix-failing pins for the round-18 ADVICE fixes.

All four r17 ADVICE items touch the oracle-guard / comparator layer:
(1) guard_nonfinite_decimal_casts wrapped already-DECIMAL-typed exprs in
printf('%.16e'), converting them through DOUBLE — lossy for >17
significant digits (measured: 282/3000 random doubles in [1e12,1e14]
perturb the oracle, e.g. ...868.2190 -> ...868.2270); (2) the checksum
digests were decimal(38,0) compared through float, discarding the low
~6 digits at 1e22 magnitudes; (3) dcast's decomposition-ceiling check
was a bare assert (vanishes under python -O); (4) the DOUBLE branch's
'AS DECIMAL(' trigger was quote/comment-blind.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark.operators._util import (
    _contains_decimal_cast,
    _toplevel_decimal_cast,
    dcast,
    guard_nonfinite_decimal_casts,
)

# the ADVICE's lossiness class, pinned concretely: a double in
# [1e12,1e14] whose (18,4) decimal carries 18 significant digits — the
# r17 printf('%.16e') outer wrap re-rendered it through DOUBLE and
# moved the oracle by 8e-3
LOSSY_X = 67993249254868.22


def test_nested_decimal_widening_left_unwrapped():
    """CAST(<decimal-typed expr> AS DECIMAL(p,s)) widening must emit a
    plain exact CAST: decimals are always finite (isfinite vacuous) and
    a widening cannot overflow, while the printf wrap is lossy."""
    g = guard_nonfinite_decimal_casts(
        "SUM(CAST(CAST(x AS DECIMAL(18,4)) AS DECIMAL(19,4))) AS s"
    )
    # the inner (double->decimal) cast gets the full guard; the outer
    # (decimal->decimal) widening must not be printf-wrapped
    assert g.count("printf('%.24e'") == 1  # inner only
    assert g.rstrip().endswith("AS DECIMAL(18,4)) AS DECIMAL(19,4))) AS s")
    assert guard_nonfinite_decimal_casts(g) == g  # idempotent


def test_nested_decimal_widening_is_lossless_in_duckdb():
    import duckdb

    sql = (
        "SELECT CAST(CAST(x AS DECIMAL(18,4)) AS DECIMAL(19,4)) AS v "
        "FROM t"
    )
    g = guard_nonfinite_decimal_casts(sql)
    con = duckdb.connect()
    try:
        con.execute(f"CREATE TABLE t AS SELECT {LOSSY_X!r}::DOUBLE AS x")
        v = con.execute(g).fetchone()[0]
        inner = con.execute(
            "SELECT "
            + guard_nonfinite_decimal_casts("CAST(x AS DECIMAL(18,4))")
            + " FROM t"
        ).fetchone()[0]
    finally:
        con.close()
    # exact widening: outer value IS the inner decimal (r17's printf
    # wrap returned ...868.2270 here instead of ...868.2190)
    assert v == inner
    assert str(v) == "67993249254868.2190"


def test_nested_decimal_narrowing_keeps_null_on_overflow(spark):
    """A narrowing decimal->decimal cast must mirror Spark's non-ANSI
    NULL-on-overflow (DuckDB's native cast raises) via an exact
    decimal-compare magnitude guard — integer literal bound, no double
    promotion, no printf."""
    import duckdb

    sql_body = "CAST(CAST(x AS DECIMAL(25,6)) AS DECIMAL(10,2))"
    g = guard_nonfinite_decimal_casts(sql_body)
    assert "THEN printf" not in g.split("AS DECIMAL(10,2))")[-2].rsplit(
        "CASE WHEN abs", 1
    )[-1][:40]
    assert guard_nonfinite_decimal_casts(g) == g  # idempotent
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            "(12345678.91::DOUBLE), (123456789.5::DOUBLE)) v(x)"
        )
        rows = con.execute(f"SELECT {g} FROM t ORDER BY 1 NULLS LAST").fetchall()
    finally:
        con.close()
    # engine sessions run non-ANSI (io.py:27); a bare Spark-4 test
    # session defaults ANSI ON where this cast THROWS instead of NULLing
    spark.conf.set("spark.sql.ansi.enabled", "false")
    sdf = spark.createDataFrame(
        [(12345678.91,), (123456789.5,)], "x double"
    ).selectExpr("CAST(CAST(x AS DECIMAL(25,6)) AS DECIMAL(10,2)) AS v")
    got = sorted(
        [r[0] for r in sdf.collect()], key=lambda v: (v is None, v)
    )
    assert [r[0] for r in rows] == got
    assert rows[-1][0] is None  # 1.23e8 overflows (10,2) -> NULL both sides


def test_contains_decimal_cast_skip_region_aware():
    assert _contains_decimal_cast("CAST(x AS DECIMAL(18,4)) + y")
    assert _contains_decimal_cast("cast(x as decimal (18, 4))")
    # quoted literal / comment occurrences are text, not structure
    assert not _contains_decimal_cast("concat(y, ' AS DECIMAL(18,4))x')")
    assert not _contains_decimal_cast("y -- AS DECIMAL(18,4)\n + z")
    assert not _contains_decimal_cast('y + "AS DECIMAL(18,4)"')


def test_toplevel_decimal_cast_detector():
    assert _toplevel_decimal_cast("CAST(x AS DECIMAL(18,4))") == (18, 4)
    assert _toplevel_decimal_cast("  cast( f(a,b) as decimal( 25, 6 ) ) ") == (25, 6)
    # not spanning the whole expr -> None (a product is not a single cast)
    assert (
        _toplevel_decimal_cast(
            "CAST(a AS DECIMAL(18,4)) * CAST(b AS DECIMAL(18,4))"
        )
        is None
    )
    assert _toplevel_decimal_cast("CAST(x AS DOUBLE)") is None
    assert _toplevel_decimal_cast("abs(x)") is None


def test_double_branch_not_triggered_by_literal():
    g = guard_nonfinite_decimal_casts(
        "CAST(concat(y, ' AS DECIMAL(18,4))x') AS DOUBLE)"
    )
    assert "VARCHAR" not in g


def test_dcast_ceiling_raises_value_error():
    """python -O strips asserts; the decomposition-exactness ceiling
    must fail loudly regardless (ADVICE r17 low)."""
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="dcast decomposition"):
        dcast(F.lit(1.0), "decimal(38,0)")


def test_checksum_digest_columns_are_exact_strings(spark, sf_small):
    """The cnt/xx_sum/mm_sum digests must compare exactly (string path),
    not through float(Decimal) + REL_TOL — at sum magnitudes ~1e22 the
    float path discards the low ~6 digits (ADVICE r17 low)."""
    from tests.oracle import checksum_compare

    def q(s, d):
        return s.read.parquet(f"{d}/nation.parquet").selectExpr(
            "n_nationkey", "n_name"
        )

    sql = "SELECT n_nationkey, n_name FROM nation"
    assert checksum_compare(spark, "digest_pin", q, sql, sf_small) == []
    # a single-row value edit at the bottom digits MUST be caught: with
    # the r17 float compare a sub-1e-16-relative digest perturbation
    # would have slipped through REL_TOL
    bad = sql + " WHERE n_nationkey != 0 UNION ALL SELECT 0, 'XX'"
    assert checksum_compare(spark, "digest_pin_bad", q, bad, sf_small) != []


def test_codepoint_levenshtein_matches_spark(spark):
    """The harness UDF must mirror Spark's F.levenshtein exactly on the
    multibyte cases where DuckDB's native byte-based levenshtein
    diverges (probed 1.0.0: 'ab'/'aنb'=2, '你好'/'你'=3, '😀'/'x'=4) —
    the basis for lifting the join_fuzzy_name_pairs ascii-subset
    exemption (round-18 item 7)."""
    from tests.oracle import codepoint_levenshtein, duckdb_conn

    cases = [
        ("ab", "aنb"), ("café", "cafe"), ("你好", "你"), ("naïve", "naive"),
        ("é", "e"), ("😀", "x"), ("", "abc"), ("kettle", "kettle"),
        ("Ω大x", "Ω大"), ("aΩb", "ab"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = [
        r[0]
        for r in df.select(F.levenshtein("a", "b")).collect()
    ]
    assert got == [codepoint_levenshtein(a, b) for a, b in cases]
    # and the registered DuckDB UDF agrees (plus NULL -> NULL passthrough)
    con = duckdb_conn("/root/testdata/sf0.001")
    try:
        for (a, b), want in zip(cases, got):
            assert con.execute("SELECT lev_cp(?, ?)", [a, b]).fetchone()[0] == want
        assert con.execute("SELECT lev_cp(NULL, 'x')").fetchone()[0] is None
        # DuckDB's native function is still byte-based: the day this
        # changes, the override can be retired
        assert con.execute("SELECT levenshtein('ab','aنb')").fetchone()[0] == 2
    finally:
        con.close()
