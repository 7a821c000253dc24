"""Differential test: every registered query vs its DuckDB oracle.

Default scale is sf0.001 (fast suite). Set SPARK_GRAFT_PARITY_SF_DIR=
/root/testdata/sf0.01 to sweep the whole registry at the DRIVER's scale
— the form of the sweep run before each round's registry reorder."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    sf_dir = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", sf_small)
    problems = run_compare(spark, name, QUERIES[name], ORACLES.get(name), sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
