"""Forced-distributed oracle-parity tier (round 15, VERDICT item 2):
the size-adaptive operators (connected_components, train_bpe_merges)
always take the DRIVER-sized branch at test scale, so their oracle
green rows only ever attested that branch — while at 100 TB the
DISTRIBUTED branches are the only ones that run. This tier forces the
thresholds to zero, replaces the driver-path helpers with raisers (a
silent fall-through to the old branch must FAIL, not re-attest), and
re-runs the standard oracle comparison for every member query.

Membership is discovered from the registry by source scan
(scripts/forced_distributed_sweep.py:discover_members) and pinned here:
a new size-adaptive operator that direct-calls an adaptive entry point
joins automatically; the assertion below catches the discovered set
silently shrinking (e.g. a rename breaking the scan).

Env-gated with the rest of the dirty evidence:
SPARK_GRAFT_NULLS_SWEEP=1.
"""

from __future__ import annotations

import os
import sys

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from forced_distributed_sweep import (  # noqa: E402
    discover_members,
    make_driver_path_guards,
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NULLS_SWEEP"),
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the forced-distributed tier",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()
MEMBERS = discover_members(QUERIES)

_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


def test_membership_scan_finds_the_known_adaptive_queries():
    # the scan drives the sweep's coverage; if it silently breaks the
    # sweep would attest nothing while still printing green
    assert {
        "bpe_first_merge_pairs",
        "bpe_train_merges",
        "dedup_minhash_clusters",
    } <= set(MEMBERS)


@pytest.mark.parametrize("name", MEMBERS)
def test_distributed_branch_matches_oracle(spark, monkeypatch, name):
    from ndl_core_data_pipeline_spark.operators import bpe, dedup

    # raise only on NON-EMPTY driver work: with thresholds 0, an empty
    # probe legitimately takes the driver branch (equivalent on both)
    uf, tf = make_driver_path_guards(dedup, bpe)
    monkeypatch.setattr(dedup, "CC_EDGES_DRIVER_MAX", 0)
    monkeypatch.setattr(bpe, "VOCAB_DRIVER_MAX", 0)
    monkeypatch.setattr(dedup, "_union_find_labels", uf)
    monkeypatch.setattr(bpe, "_train_from_freqs", tf)

    problems = run_compare(spark, name, QUERIES[name], ORACLES.get(name), _SF_DIR)
    assert not problems, f"{name} forced-distributed: " + "; ".join(problems)
