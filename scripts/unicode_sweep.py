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


# Queries whose FULL multibyte result is oracle-inexpressible: compared
# on the all-ASCII row subset instead, with the reason and dropped-row
# counts recorded in the checkpoint (parity_sweep ascii_subset).
ASCII_SUBSET_EXEMPT = {
    "join_fuzzy_name_pairs": {
        "reason": (
            "DuckDB 1.x levenshtein/damerau/editdist3 are all BYTE-based "
            "(probed: levenshtein('ab','aنb')=2); the engine's "
            "F.levenshtein is code-point-based, matching the reference's "
            "Python semantics. No stock-DuckDB expression reproduces "
            "code-point edit distance, so multibyte-name pairs are "
            "uncheckable; ASCII-name pairs (the clean driver data) remain "
            "fully checked."
        ),
        # the divergent semantics changes the multibyte PAIR COUNT
        # itself: a pair whose code-point distance meets the join
        # threshold can exceed it in bytes (each multibyte char
        # multiplies its byte weight), so the engine legitimately emits
        # multibyte pairs the oracle never produces — r14 recorded
        # spark=1/oracle=0 dropped rows. Counts are recorded per run;
        # only DECLARED mismatches pass (r14 ADVICE).
        "allow_count_mismatch": True,
    },
}


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
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
