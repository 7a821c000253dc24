"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column-name set, and order-insensitive values (exact
for non-floats, bitwise-preferred with reported max-abs-diff for floats —
queries are engineered so even floats match exactly; any diff > 1e-9 fails).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from ndl_core_data_pipeline_spark.io import TABLES

FLOAT_TOL = 1e-9

_EPOCH = datetime.datetime(1970, 1, 1)


def _arrow_to_pandas(tbl) -> pd.DataFrame:
    """Materialize an Arrow table WITHOUT the pandas nanosecond funnel:
    timestamps keep their native unit (datetime64[us] spans years
    ±290k — year 1, year 9999, and the sub-year-1 instants a week/
    window-start computation on a year-1 timestamp legitimately
    produces, all of which OutOfBounds-crash or ValueError the default
    ns/py-datetime conversions), and dates become datetime64[ms] for
    the same reason (a year-0 DATE cannot exist as datetime.date).
    Extreme-timestamp axis: 16 of the 22 first-run failures were THIS
    comparator's materialization, not engine divergence."""
    return tbl.to_pandas(
        coerce_temporal_nanoseconds=False,
        date_as_object=False,
        timestamp_as_object=False,
    )


def _py_temporal_to_micros(v):
    """Exact epoch-microsecond int for python date/datetime/Timestamp
    values (integer timedelta arithmetic — float total_seconds() loses
    microseconds past 2^53/1e6 ≈ year 2255)."""
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        td = v.replace(tzinfo=None) - _EPOCH
    elif isinstance(v, datetime.date):
        td = datetime.datetime(v.year, v.month, v.day) - _EPOCH
    else:
        return v
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def _temporal_series_to_micros(s: pd.Series) -> pd.Series:
    """Canonical temporal representation: nullable Int64 epoch
    microseconds. Unit- and bounds-free, so a DATE on one side equals
    the midnight TIMESTAMP on the other (as the previous datetime64
    coercion already guaranteed) for ANY year, and the sort key is a
    plain integer."""
    if getattr(s.dt, "tz", None) is not None:
        s = s.dt.tz_localize(None)  # wall time, as before
    s = s.astype("datetime64[us]")
    mask = s.isna()
    ints = pd.Series(s.to_numpy().view("int64"), index=s.index, dtype="int64")
    return ints.astype("Int64").mask(mask)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # The oracles' ORDER BY clauses are written against the ENGINE's
    # collation convention, which is Spark's: ASC = NULLS FIRST,
    # DESC = NULLS LAST. DuckDB defaults to NULLS LAST on both; align
    # the session so window frames / LIMIT cutoffs agree when a sort
    # key is NULL (driver tables have no NULL sort keys, so the driver's
    # own un-pragma'd connection cannot diverge on this).
    #
    # r12 DuckDB-1.0 landmines this pragma does NOT cover (both found
    # by the oracle-stability sweep, scripts/oracle_stability_sweep.py):
    # 1. date_trunc on a NULLABLE argument emits a null value flagged
    #    NOT-null (corrupted validity mask) — IS NULL/COALESCE then lie
    #    about it and a parallel window sort over it places the row
    #    NONDETERMINISTICALLY (same row ranked 1 or 244 run to run).
    #    Oracles must CASE-guard: CASE WHEN src IS NULL THEN NULL ELSE
    #    date_trunc(...) END.
    # 2. Window/aggregate ORDER BY keys containing real NULLs can be
    #    unstable under parallelism even with this pragma — write such
    #    keys null-free: `(k IS NOT NULL), k` prefixes, or a
    #    CTE-materialized COALESCE sentinel column.
    #
    #    Scope of the null-free rewrite (ADVICE r12): it is applied at
    #    the sites the stability sweep has CAUGHT (arrays string_agg,
    #    trend_weekly_growth). The ~40 remaining window ORDER BY sites
    #    keep nullable keys DELIBERATELY, for three reasons:
    #    (a) window keys must be PLAIN columns (expression keys inside
    #        OVER are themselves in the unreliable class), so a uniform
    #        fix means CTE-materializing a (k IS NOT NULL) flag column
    #        PLUS a collision-proof COALESCE sentinel column per key —
    #        a structural rewrite of ~40 oracles whose own regression
    #        risk exceeds the risk it removes;
    #    (b) the failure mode is run-to-run RESULT VARIANCE, which the
    #        standing scripts/oracle_stability_sweep.py measures
    #        directly on dirty data — per-round certification at high
    #        rep count (r12: 10 reps 220/220; r13: 30 reps) bounds the
    #        per-site flip probability, and the two independent
    #        dirty-parity seeds + the order sweep must all agree too;
    #    (c) the contract is detect-then-fix: any site the sweep ever
    #        flags gets the null-free rewrite, as the two known catches
    #        did.
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = _temporal_series_to_micros(s)
        elif s.dtype == object:
            # Decimal → float, lists/arrays → tuples for sortability,
            # date/datetime objects (a materializer fallback path) →
            # the same canonical epoch-micros ints as datetime64 columns
            df[c] = s.map(
                lambda v: float(v)
                if type(v).__name__ == "Decimal"
                else (
                    tuple(v.tolist())
                    if type(v).__name__ == "ndarray"
                    else (
                        tuple(v)
                        if isinstance(v, (list, tuple))
                        else (
                            _py_temporal_to_micros(v)
                            if isinstance(v, datetime.date)
                            else v
                        )
                    )
                )
            )
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_df) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s = _canon(spark_df)
    o = _canon(oracle_df)
    if set(s.columns) != set(o.columns):
        return [f"column mismatch: spark={sorted(s.columns)} oracle={sorted(o.columns)}"]
    if len(s) != len(o):
        return [f"row count mismatch: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype("float64")
            ov = ov.astype("float64")
            both_nan = sv.isna() & ov.isna()
            # IEEE equality first: inf - inf = nan, so the tolerance
            # test alone flags EQUAL infinities as diffs (round-15
            # non-finite tier). -0.0 == 0.0 under IEEE is accepted here;
            # a rendering-sensitive consumer (md5 of a formatted float)
            # compares exactly via its string column.
            same = sv == ov
            diff = (sv - ov).abs()
            bad = ~both_nan & ~same & ~(diff <= FLOAT_TOL)
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {int(bad.sum())} float diffs > {FLOAT_TOL} "
                    f"(e.g. row {i}: {sv[i]!r} vs {ov[i]!r})"
                )
            else:
                exact = ((sv == ov) | both_nan).all()
                if not exact:
                    mx = diff[~both_nan].max()
                    problems.append(
                        f"WARN col {c}: non-bitwise floats (max abs diff {mx:.3e})"
                    )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: value mismatch at row {i}: {sv[i]!r} vs {ov[i]!r}"
                )
    return [p for p in problems if not p.startswith("WARN")] or (
        [] if not problems else []
    )


def run_compare(spark, name: str, fn, sql: str | None, sf_dir: str) -> list[str]:
    out = fn(spark, sf_dir)
    # Arrow-first materialization (see _arrow_to_pandas); toPandas only
    # for plans Arrow can't carry (e.g. a VARIANT output column)
    try:
        sdf = _arrow_to_pandas(out.toArrow())
    except Exception:
        sdf = out.toPandas()
    if sql is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    con = duckdb_conn(sf_dir)
    try:
        odf = _arrow_to_pandas(con.execute(sql).arrow())
    finally:
        con.close()
    return compare(sdf, odf)
