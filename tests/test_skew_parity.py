"""Hot-key skew correctness tier (round 15, seventh robustness axis —
VERDICT r14 missing #6): every registered query runs against an sf0.01
copy where one value carries ~50% of the rows in each skew-relevant
column (scripts/gen_scale.py inject_hotkey — hot join keys, hot group
keys, one minhash band / LSH bucket / gram family holding half the
corpus) and must still match its DuckDB oracle value-for-value.

The salted-join, banded-dedup-cap and Misra-Gries paths exist precisely
for this data shape; until this tier only their TIMING was measured
(SCALE_ADVERSARIAL_r11) — never cross-engine correctness under a hot
key. The fixture deliberately stays under MAX_BUCKET_MEMBERS so
engine-vs-oracle comparison is exact (cap truncation is a documented,
observe()-able deviation, not silently attested here).

Env-gated (full-registry run): SPARK_GRAFT_NULLS_SWEEP=1.
Batch runner with resume: scripts/skew_sweep.py.
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
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the hot-key skew tier",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.fixture(scope="session")
def hotkey_sf_dir():
    from skew_sweep import ensure_hotkey_dataset

    out = os.path.join(_REPO, ".scale", "hotkey0.01")
    base = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
    ensure_hotkey_dataset(base, out)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_hotkey_data(spark, hotkey_sf_dir, name):
    problems = run_compare(
        spark, name, QUERIES[name], ORACLES.get(name), hotkey_sf_dir
    )
    assert not problems, f"{name} on hot-key data: " + "; ".join(problems)
