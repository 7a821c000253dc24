#!/usr/bin/env python
"""Compound-dirty escalation probe (round 16, VERDICT item 5).

Every certified adversarial axis so far is SINGLE-axis: one fixture
carries NULLs, another unicode, another a hot key. Real 100 TB corpora
are all three at once, and the r15 evidence says escalation finds bugs
certification misses (30% NULL found 10 where 2% found 0) — interaction
bugs are the next stratum. This probe chains the three injectors over
one sf0.01 copy:

    base --inject_hotkey(50%)--> --inject_unicode(5%)--> --inject_nulls(30%)-->

(hot keys first so concentration applies to real values; unicode before
NULLs so string mutation sees full columns; NULL/NaN/empty last at the
r16-certified null-heavy densities). The full registry then runs
against the compound copy with the standard run_compare; the unicode
tier's declared ascii-subset exemptions apply (the fixture contains
multibyte text, so the byte-vs-codepoint levenshtein gap is present
here too).

Usage: python scripts/compound_sweep.py [--out .scale/compound_sweep.json]
         [--dir .scale/compound0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOTKEY_PARAMS = {"seed": 1503, "frac": 0.5}
UNICODE_PARAMS = {"seed": 8814, "frac": 0.05}
NULL_PARAMS = {
    "seed": 7121,
    "frac_null": 0.3,
    "frac_nan": 0.02,
    "frac_empty": 0.02,
    "frac_inf": 0.0,
    "frac_negzero": 0.0,
}


def ensure_compound_dataset(base: str, out: str) -> None:
    from gen_scale import (
        _snippet_pool_fingerprint,
        inject_hotkey,
        inject_nulls,
        inject_unicode,
    )

    manifest = os.path.join(out, "COMPOUND_MANIFEST.json")
    want = {
        "mode": "compound",
        "base": base,
        "stages": ["hotkey", "unicode", "nulls"],
        "hotkey": HOTKEY_PARAMS,
        "unicode": {**UNICODE_PARAMS, "snippet_pool": _snippet_pool_fingerprint()},
        "nulls": NULL_PARAMS,
    }
    if os.path.exists(manifest):
        with open(manifest) as fh:
            if json.load(fh) == want:
                return
        print(f"rebuilding {out}: compound manifest is stale", flush=True)
    tmp1 = out.rstrip("/") + ".stage_hot"
    tmp2 = out.rstrip("/") + ".stage_uni"
    for d in (tmp1, tmp2, out):
        if os.path.isdir(d):
            shutil.rmtree(d)
    inject_hotkey(base, tmp1, **HOTKEY_PARAMS)
    inject_unicode(tmp1, tmp2, **UNICODE_PARAMS)
    inject_nulls(tmp2, out, **NULL_PARAMS)
    shutil.rmtree(tmp1)
    shutil.rmtree(tmp2)
    with open(manifest, "w") as fh:
        json.dump(want, fh, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/compound_sweep.json")
    ap.add_argument("--dir", default=".scale/compound0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_compound_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep
    from unicode_sweep import ASCII_SUBSET_EXEMPT, sweep_sql_overrides

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(
        args.dir, args.out, only=only, redo=args.redo,
        ascii_subset=ASCII_SUBSET_EXEMPT,
        sql_overrides=sweep_sql_overrides(),
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
