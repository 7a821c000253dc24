#!/usr/bin/env python
"""Unicode/multibyte text-parity sweep (round 14, sixth robustness axis
— VERDICT r13 missing #5): the full registry runs against an sf0.01
copy whose string cells carry CJK / emoji / NBSP / combining-mark /
full-width / RTL text (scripts/gen_scale.py inject_unicode), and every
query must still match its DuckDB oracle value-for-value.

Real training corpora are mostly non-ASCII, and the two engines
implement text semantics independently: Spark's UTF8String (JVM) vs
DuckDB's utf8proc — case mapping, length(), regex classes and binary
collation can all diverge on exactly these code points. The engine's
tokenizer is deliberately ASCII-\\s (operators/_util.WS_ASCII_RE) and
md5 is byte-level on both sides, but until this sweep nothing ATTESTED
that ~20 text queries (BM25, PMI, KWIC, Zipf, BPE, fingerprints,
quality scores) agree on multibyte input.

Usage: python scripts/unicode_sweep.py [--out .scale/unicode_sweep.json]
         [--dir .scale/unicode0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Round 18 (VERDICT r17 item 7): the former ascii-subset exemption for
# join_fuzzy_name_pairs is LIFTED. DuckDB 1.x levenshtein/editdist3/
# damerau_levenshtein are byte-based (re-probed on 1.0.0:
# levenshtein('ab','aنb')=2, ('你好','你')=3, ('😀','x')=4) where the
# engine's F.levenshtein is code-point-based — but the harness's DuckDB
# connection now registers a code-point Levenshtein UDF
# (tests/oracle.duckdb_conn: lev_cp), so multibyte fixtures compare the
# FULL result against graphs.FUZZY_SQL_CODEPOINT instead of dropping
# non-ASCII rows. The driver-registered oracle keeps stock SQL (the
# driver's DuckDB has no UDFs; its names are all-ASCII where the two
# queries are identical).
ASCII_SUBSET_EXEMPT: dict[str, dict] = {}


def sweep_sql_overrides() -> dict[str, str]:
    from ndl_core_data_pipeline_spark.operators.graphs import (
        FUZZY_SQL_CODEPOINT,
    )

    return {"join_fuzzy_name_pairs": FUZZY_SQL_CODEPOINT}


def ensure_unicode_dataset(base: str, out: str) -> None:
    """Build the fixture if missing or if its manifest no longer matches
    the injection parameters (empty_sweep's manifest pattern)."""
    from gen_scale import _snippet_pool_fingerprint, inject_unicode

    manifest = os.path.join(out, "MANIFEST.json")
    want = {
        "mode": "unicode",
        "base": base,
        "seed": 8814,
        "frac": 0.05,
        "snippet_pool": _snippet_pool_fingerprint(),
    }
    if os.path.exists(manifest):
        with open(manifest) as fh:
            if json.load(fh) == want:
                return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_unicode(base, out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/unicode_sweep.json")
    ap.add_argument("--dir", default=".scale/unicode0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_unicode_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(
        args.dir, args.out, only=only, redo=args.redo,
        ascii_subset=ASCII_SUBSET_EXEMPT,
        sql_overrides=sweep_sql_overrides(),
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
