#!/usr/bin/env python
"""Extreme-finite-double parity sweep — STANDING GATE as of round 17.

Round 16 ran this axis ad-hoc (EXTREME_r16.json): 0.5% of every double
column replaced with ±1e300 / ±1e19 / 9.9e18 / 1e-300 / 5e-324 /
DBL_MAX (seed 6161). The first run's 40 oracle crashes and 3 cast bugs
were fixed in-round; the 24 standing residuals were all the
comparator's ABSOLUTE 1e-9 float tolerance being unsatisfiable past
float64's 15.95 significant digits (1 ULP ≈ 2048 at 1e19) — both
engines agreed to ~1 ULP, the comparator just couldn't say so. Round
17's REL_TOL (2-ULP relative band, tests/oracle.py) closes that class,
so the axis is promoted: committed generator (gen_scale.
inject_double_extremes, same recipe/seed), standing runner (this
script), certify SWEEP_FILES gate.

Usage: python scripts/double_extreme_sweep.py
         [--out .scale/double_extreme_sweep.json]
         [--dir .scale/dblextreme0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"seed": 6161, "frac": 0.005}


def ensure_double_extreme_dataset(base: str, out: str) -> None:
    from gen_scale import inject_double_extremes

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "double-extreme", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_double_extremes(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/double_extreme_sweep.json")
    ap.add_argument("--dir", default=".scale/dblextreme0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_double_extreme_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
