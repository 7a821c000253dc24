#!/usr/bin/env python
"""Non-finite doubles parity sweep (round 15, VERDICT item 7 — the
eighth robustness axis): the full registry runs against an sf0.01 copy
whose double columns carry NaN, +Inf, -Inf AND IEEE negative zero on
top of the r11 dirty-tier injections, and every query must still match
its DuckDB oracle value-for-value.

The r11 dirty tier injects NaN (and the decimal-cast guard shields
every oracle CAST), but ±Inf and -0.0 were never planted: Inf survives
casts differently (Spark non-ANSI CAST(Inf AS BIGINT) = Long.MAX, and
isfinite guards drop it from decimal sums on both sides), and -0.0 is
the classic grouping/sorting divider (IEEE -0.0 == 0.0 but the two have
different bit patterns and different string renderings; Spark
normalizes -0.0 to 0.0 in groupBy/join keys — UnsafeRow writer — while
DuckDB hashes the raw bits in some versions). Engine-vs-oracle NaN/Inf
ORDERING and -0.0 GROUPING over raw doubles were unattested until this
sweep.

Usage: python scripts/nonfinite_sweep.py [--out .scale/nonfinite_sweep.json]
         [--dir .scale/nonfinite0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {
    "seed": 7119,
    "frac_null": 0.02,
    "frac_nan": 0.01,
    "frac_empty": 0.01,
    "frac_inf": 0.01,
    "frac_negzero": 0.01,
}


def ensure_nonfinite_dataset(base: str, out: str) -> None:
    from gen_scale import inject_nulls

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "nonfinite", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_nulls(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/nonfinite_sweep.json")
    ap.add_argument("--dir", default=".scale/nonfinite0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_nonfinite_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
