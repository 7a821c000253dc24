"""Compound-dirty differential sweep — standing tier (round 16).

One sf0.01 copy carries all three adversarial axes at once — hot keys
(50% single-value concentration), unicode injection (5%), and
null-heavy densities (30% NULL / 2% NaN / 2% empty) — because real
corpora are never single-axis dirty and the first compound probe found
six interaction bugs every per-axis certified tier had passed (see
tests/test_compound_fixes.py). Every registered query must match its
DuckDB oracle on the compound copy; the unicode tier's declared
ascii-subset exemptions apply.

Env-gated (full-registry run, ~10 min):

    SPARK_GRAFT_COMPOUND_SWEEP=1 python -m pytest tests/test_compound_parity.py -q

The fixture chain is owned by scripts/compound_sweep.py (one manifest
covers all three stages).
"""

from __future__ import annotations

import os
import sys

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_COMPOUND_SWEEP"),
    reason="set SPARK_GRAFT_COMPOUND_SWEEP=1 to run the compound sweep",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from unicode_sweep import ASCII_SUBSET_EXEMPT  # noqa: E402


@pytest.fixture(scope="session")
def compound_sf_dir():
    from compound_sweep import ensure_compound_dataset

    out = os.path.join(_REPO, ".scale", "compound0.01")
    ensure_compound_dataset("/root/testdata/sf0.01", out)
    return out


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n not in ASCII_SUBSET_EXEMPT)
)
def test_query_matches_oracle_on_compound_data(spark, compound_sf_dir, name):
    problems = run_compare(
        spark, name, QUERIES[name], ORACLES.get(name), compound_sf_dir
    )
    assert not problems, f"{name}: " + "; ".join(problems)
