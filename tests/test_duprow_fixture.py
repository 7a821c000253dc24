"""Property pins for the duplicate-row fixture generator.

The axis' first form appended byte-exact rows INCLUDING the id and 11
queries diverged — every one a planted id-collision, i.e. input the
declared id contract (checks.enforce_unique_key) excludes because
per-id and trained operators have no defined multiplicity semantics in
ANY engine. The shipped form appends identical payloads under FRESH
ids (the retry/re-crawl shape), which is fully defined: the re-keyed
sweep is 221/221 (DUPROW_r16.json). These pins hold the generator's
two load-bearing properties so a future edit cannot silently recreate
the undefined form.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

_SRC = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_duprow_fixture_unique_ids_and_copied_payloads(tmp_path):
    from gen_scale import DUPROW_REKEY, inject_duprows

    out = str(tmp_path / "dup")
    inject_duprows(_SRC, out, seed=99, frac=0.3)
    for t, key in DUPROW_REKEY.items():
        base = pq.read_table(os.path.join(_SRC, f"{t}.parquet"))
        dup = pq.read_table(os.path.join(out, f"{t}.parquet"))
        n, m = base.num_rows, dup.num_rows
        assert m > n  # duplicates actually appended
        ids = dup.column(key).to_pylist()
        if t == "lineitem":
            # lineitem is the identityless fact table: the DRIVER's own
            # data holds duplicate (l_orderkey, l_linenumber) pairs
            # (sf0.001: 6000 rows, 4599 distinct), so no per-row id
            # contract exists there — the appended keys just must be
            # fresh and self-unique so no planted basket merges
            new = ids[n:]
            assert len(set(new)) == len(new)
            assert not (set(new) & set(ids[:n]))
        else:
            assert len(set(ids)) == len(ids), f"{t}.{key} not unique"
        # appended payloads are copies of existing rows (check one
        # non-key column's value set is unchanged)
        other = next(c for c in dup.column_names if c != key)
        base_vals = set(map(repr, base.column(other).to_pylist()))
        new_vals = set(map(repr, dup.column(other).to_pylist()[n:]))
        assert new_vals <= base_vals, f"{t}.{other} invented new payloads"
