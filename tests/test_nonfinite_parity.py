"""Non-finite doubles parity tier (round 15, eighth robustness axis —
VERDICT r14 item 7): every registered query runs against an sf0.01 copy
whose double columns carry NaN, ±Inf and IEEE negative zero (on top of
the r11 NULL/NaN/'' injections) and must still match its DuckDB oracle
value-for-value.

The r11 dirty tier never planted ±Inf or -0.0: Inf exercises the
isfinite guards and Spark's non-ANSI saturating casts; -0.0 is the
grouping/sorting divider (equal to 0.0 under IEEE comparison but
bitwise distinct — Spark normalizes it in UnsafeRow grouping keys).

Env-gated (full-registry run): SPARK_GRAFT_NULLS_SWEEP=1.
Batch runner with resume: scripts/nonfinite_sweep.py.
"""

from __future__ import annotations

import os
import sys

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NULLS_SWEEP"),
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the non-finite tier",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.fixture(scope="session")
def nonfinite_sf_dir():
    from nonfinite_sweep import ensure_nonfinite_dataset

    out = os.path.join(_REPO, ".scale", "nonfinite0.01")
    base = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
    ensure_nonfinite_dataset(base, out)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_nonfinite_doubles(spark, nonfinite_sf_dir, name):
    problems = run_compare(
        spark, name, QUERIES[name], ORACLES.get(name), nonfinite_sf_dir
    )
    assert not problems, f"{name} on non-finite doubles: " + "; ".join(problems)
