#!/usr/bin/env python
"""Duplicate-row INTERACTION probe (round 17, verdict item 6): the
realistic re-crawl shape is duplicated payloads whose copies then get
INDEPENDENTLY dirtied — correlated-but-not-identical rows, which no
single-axis fixture has. Chain over one sf0.01 copy:

    base --inject_hotkey(50%)--> --inject_duprows(30%, fresh ids)-->
         --inject_nulls(30%)-->

(hot keys first so duplication multiplies the concentrated keys too;
duprows second so the appended payload-copies exist BEFORE dirtying;
NULL/NaN/empty last so each copy of a duplicated payload is nulled
independently — a pair of once-identical rows now differs in whichever
cells the null pass hit, the exact near-duplicate shape a retry storm
plus lossy re-extraction produces). The full registry then runs against
the copy with the standard run_compare.

This stacks three certified axes: the duplication stresses multiplicity
semantics (count-vs-distinct splits, df caps, basket pairs), the skew
stresses the salted/hot paths ON duplicated keys, and the null pass
breaks payload-identity so "fully duplicate rows, whose swap is
output-invariant" totality exemptions get re-tested where copies are no
longer byte-equal.

Usage: python scripts/duprow_compound_sweep.py
         [--out .scale/duprow_compound_sweep.json]
         [--dir .scale/duprow_compound0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOTKEY_PARAMS = {"seed": 1607, "frac": 0.5}
DUPROW_PARAMS = {"seed": 3167, "frac": 0.3}
NULL_PARAMS = {
    "seed": 7129,
    "frac_null": 0.3,
    "frac_nan": 0.02,
    "frac_empty": 0.02,
    "frac_inf": 0.0,
    "frac_negzero": 0.0,
}


def ensure_duprow_compound_dataset(base: str, out: str) -> None:
    from gen_scale import inject_duprows, inject_hotkey, inject_nulls

    manifest = os.path.join(out, "COMPOUND_MANIFEST.json")
    want = {
        "mode": "duprow-compound",
        "base": base,
        "stages": ["hotkey", "duprows", "nulls"],
        "hotkey": HOTKEY_PARAMS,
        "duprows": DUPROW_PARAMS,
        "nulls": NULL_PARAMS,
    }
    if os.path.exists(manifest):
        with open(manifest) as fh:
            if json.load(fh) == want:
                return
        print(f"rebuilding {out}: compound manifest is stale", flush=True)
    tmp1 = out.rstrip("/") + ".stage_hot"
    tmp2 = out.rstrip("/") + ".stage_dup"
    for d in (tmp1, tmp2, out):
        if os.path.isdir(d):
            shutil.rmtree(d)
    inject_hotkey(base, tmp1, **HOTKEY_PARAMS)
    inject_duprows(tmp1, tmp2, **DUPROW_PARAMS)
    inject_nulls(tmp2, out, **NULL_PARAMS)
    shutil.rmtree(tmp1)
    shutil.rmtree(tmp2)
    with open(manifest, "w") as fh:
        json.dump(want, fh, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/duprow_compound_sweep.json")
    ap.add_argument("--dir", default=".scale/duprow_compound0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_duprow_compound_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep
    from unicode_sweep import sweep_sql_overrides

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(
        args.dir, args.out, only=only, redo=args.redo,
        sql_overrides=sweep_sql_overrides(),
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
