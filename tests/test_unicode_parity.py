"""Unicode/multibyte text-parity tier (round 14, sixth robustness axis
— VERDICT r13 missing #5): every registered query runs against an
sf0.01 copy whose string cells carry CJK / emoji / NBSP /
combining-mark / full-width / RTL / Turkish-dotless text
(scripts/gen_scale.py inject_unicode) and must still match its DuckDB
oracle value-for-value.

Real training corpora are mostly non-ASCII; Spark (JVM UTF8String) and
DuckDB (utf8proc) implement case mapping, length(), regex classes and
collation independently, so any query that assumed ASCII — or leaned on
an engine-specific Unicode behavior — diverges exactly here. The
engine's deliberate choices this tier attests: ASCII-\\s tokenization
(operators/_util.WS_ASCII_RE ≡ RE2/Java \\s), byte-level md5, binary
UTF-8 collation, code-point length() on both engines.

Env-gated (full-registry run): SPARK_GRAFT_NULLS_SWEEP=1.
Batch runner with resume: scripts/unicode_sweep.py.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as contract

from .oracle import run_compare

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NULLS_SWEEP"),
    reason="set SPARK_GRAFT_NULLS_SWEEP=1 to run the unicode-parity sweep",
)

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.fixture(scope="session")
def unicode_sf_dir():
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from unicode_sweep import ensure_unicode_dataset

    out = os.path.join(repo, ".scale", "unicode0.01")
    base = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
    ensure_unicode_dataset(base, out)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_unicode_text(spark, unicode_sf_dir, name):
    problems = run_compare(
        spark, name, QUERIES[name], ORACLES.get(name), unicode_sf_dir
    )
    assert not problems, f"{name}: " + "; ".join(problems)
