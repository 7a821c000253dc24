"""Pin tests for the comparator's canonical temporal representation.

The extreme-timestamp axis' first run failed 22 queries, 16 of them in
the COMPARATOR, not the engines: pandas' default nanosecond funnel
cannot hold year 1 / year 9999 (OutOfBoundsDatetime), python datetime
cannot hold the sub-year-1 instants a week-trunc/window-start on a
year-1 timestamp legitimately produces (ValueError: year 0), and the
partial fallbacks left one side datetime.date objects against the
other's datetime64 (false value-mismatches). tests/oracle.py now
materializes through Arrow with native units and canonicalizes every
temporal to exact epoch-microsecond Int64 — these pins hold that
contract.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd

from .oracle import _py_temporal_to_micros, _temporal_series_to_micros, compare


def test_date_equals_midnight_timestamp_any_year():
    dates = pd.DataFrame(
        {"d": [datetime.date(1, 1, 1), datetime.date(9999, 12, 31), None]}
    )
    stamps = pd.DataFrame(
        {
            "d": pd.Series(
                np.array(
                    ["0001-01-01T00:00:00", "9999-12-31T00:00:00", "NaT"],
                    dtype="datetime64[us]",
                )
            )
        }
    )
    assert compare(dates, stamps) == []


def test_sub_year_one_instants_compare_exactly():
    # week-trunc of 0001-01-01 lands in "year 0" — representable as
    # datetime64 micros, unrepresentable as python datetime
    v = np.array([-62135596800000000 - 5 * 86400_000_000], "datetime64[us]")
    a = pd.DataFrame({"t": pd.Series(v)})
    b = pd.DataFrame({"t": pd.Series(v.copy())})
    assert compare(a, b) == []
    c = pd.DataFrame({"t": pd.Series(v + np.timedelta64(1, "us"))})
    assert compare(a, c) != []  # one microsecond apart must still FAIL


def test_micros_are_exact_at_both_edges():
    lo = _py_temporal_to_micros(datetime.datetime(1, 1, 1))
    hi = _py_temporal_to_micros(datetime.datetime(9999, 12, 31, 23, 59, 59, 999999))
    assert lo == -62135596800000000
    assert hi == 253402300799999999
    s = pd.Series(np.array([lo, hi], "datetime64[us]"))
    assert _temporal_series_to_micros(s).tolist() == [lo, hi]


def test_mixed_unit_series_canonicalize_identically():
    us = pd.Series(np.array(["2024-03-01T10:00:00"], "datetime64[us]"))
    ns = pd.Series(np.array(["2024-03-01T10:00:00"], "datetime64[ns]"))
    ms = pd.Series(np.array(["2024-03-01T10:00:00"], "datetime64[ms]"))
    out = {_temporal_series_to_micros(s)[0] for s in (us, ns, ms)}
    assert len(out) == 1
