"""Standing element-null tier (VERDICT r11 item 5): NULL/NaN elements
INSIDE embedding arrays, vs the whole-cell NULLs the main dirty sweep
injects. Two layers:

1. An UNGATED membership guard: the probe list in
   scripts/probe_element_nulls.py used to be hand-maintained, so a new
   embedding consumer added in a later round would silently escape the
   probe. The guard greps every registered oracle for embedding
   references and fails the suite if any consumer is missing from the
   list (it found two escapees the day it was written:
   project_drop_vector and quality_constraint_report).

2. A SPARK_GRAFT_NULLS_SWEEP-gated run of every probe query against the
   element-null copy. The contract is validate-and-reject: consumers
   must be NON-CRASHING (ANN rankings legitimately diverge on undefined
   distances), and the quality report's vector_elements_valid rule must
   count exactly the injected corrupt vectors.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

import __spark_entry__ as contract

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from probe_element_nulls import VECTOR_QUERIES, build  # noqa: E402

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()

ELEM_DIR = os.environ.get(
    "SPARK_GRAFT_ELEMNULLS_SF_DIR",
    os.path.join(_REPO, ".scale", "elemnulls0.01"),
)

_tier = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NULLS_SWEEP"),
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the element-null tier",
)


def test_probe_list_covers_every_embedding_consumer():
    """Membership is decided by a registry grep, not a hand-kept list: an
    oracle that references the embeddings table (or an embedding column)
    marks its query as an element-null consumer. Over-approximation is
    fine (a consumer that ignores elements trivially passes the tier);
    a MISSING consumer is the silent escape this guard exists to stop.
    Oracle-LESS queries (today only bpe_train_merges) are grepped by
    their Python source instead, so the rows-only class can't slip an
    embedding consumer past the tier either (review finding)."""
    import inspect

    consumers = {
        n for n, sql in ORACLES.items() if re.search(r"\bembedding", sql, re.I)
    }
    for n, fn in QUERIES.items():
        if n in ORACLES:
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = n  # unsourceable callable: fall back to its name
        if re.search(r"\bembedding", src, re.I):
            consumers.add(n)
    missing = sorted(consumers - set(VECTOR_QUERIES))
    assert not missing, (
        "embedding-consuming queries missing from the element-null probe "
        f"list (scripts/probe_element_nulls.py): {missing}"
    )
    stale = sorted(set(VECTOR_QUERIES) - set(QUERIES))
    assert not stale, f"probe list names not in the registry: {stale}"


@pytest.fixture(scope="session")
def elem_sf_dir():
    if not os.path.exists(os.path.join(ELEM_DIR, "MANIFEST.json")):
        build(ELEM_DIR)
    return ELEM_DIR


@_tier
@pytest.mark.parametrize("name", VECTOR_QUERIES)
def test_embedding_consumer_survives_element_nulls(spark, elem_sf_dir, name):
    # non-crashing is the contract; .count() forces full execution
    assert QUERIES[name](spark, elem_sf_dir).count() >= 0


@_tier
def test_quality_report_counts_corrupt_vectors(spark, elem_sf_dir):
    with open(os.path.join(elem_sf_dir, "MANIFEST.json")) as fh:
        n_corrupt = json.load(fh)["n_corrupt_vectors"]
    rows = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in QUERIES["quality_constraint_report"](spark, elem_sf_dir).collect()
    }
    assert rows["vector_elements_valid(embedding)"] == (n_corrupt, False)
