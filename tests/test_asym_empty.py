"""Asymmetric-emptiness tier (round 14, fifth robustness axis): every
registry query must be CORRECT — oracle-matching, not merely total —
when exactly one of its input tables is empty while the others carry
data. The all-empty sweep (tests/test_empty_totality.py) cannot catch a
LEFT join silently behaving as INNER, an anti-join "skip if exists"
that drops everything when the existing side is empty, or a zero-row
broadcast build side; this tier can, because the DuckDB oracle runs on
the same asymmetric data and pins the SQL contract.

Per-query input tables are discovered by spying on
DataFrameReader.parquet during one construction pass (engine modules
bind io.load at import time, so the spy sits below them) — see
scripts/asym_empty_sweep.py, the batch runner with resume.

Env-gated with the rest of the dirty evidence (full tier is ~282
query-table pairs): SPARK_GRAFT_NULLS_SWEEP=1.
"""

from __future__ import annotations

import os
import sys

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from asym_empty_sweep import build_asym_datasets, table_membership  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NULLS_SWEEP"),
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the asymmetric-empty tier",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()

_BASE = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
_ROOT = os.path.join(_REPO, ".scale", "asym_empty")


@pytest.fixture(scope="session")
def asym(spark):
    dirs = build_asym_datasets(_BASE, _ROOT)
    membership = table_membership(spark, QUERIES, _BASE)
    return dirs, membership


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_is_correct_with_each_input_table_empty(spark, asym, name):
    dirs, membership = asym
    for t in membership.get(name, []):
        problems = run_compare(
            spark, name, QUERIES[name], ORACLES.get(name), dirs[t]
        )
        assert not problems, f"{name} with empty {t}: " + "; ".join(problems)
