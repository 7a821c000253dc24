"""Differential test: every registered query vs its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — see __spark_entry__.py)."""

from __future__ import annotations

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    problems = run_compare(spark, name, QUERIES[name], ORACLES.get(name), sf_small)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
