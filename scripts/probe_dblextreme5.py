#!/usr/bin/env python
"""One-off ESCALATION PROBE (round 17): extreme finite doubles at 10x
the gate density (5% of every double column, fresh seed 6172) — the
same ladder rung every other axis got (bigint 5%, timestamp 5%, null
50%). A probe, not a gate: this runner is deliberately NOT in
_sweeplib._HASH_INPUTS (it composes the committed generator + the
shared parity loop and changes no sweep-determining behavior), so
running it does not reopen the certified tree freeze."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"seed": 6172, "frac": 0.05}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/dblextreme5_sweep.json")
    ap.add_argument("--dir", default=".scale/dblextreme5pct0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    from gen_scale import inject_double_extremes

    manifest = os.path.join(args.dir, "MANIFEST.json")
    want = {"mode": "double-extreme", "base": args.base, **PARAMS}
    ok = False
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        ok = {k: got.get(k) for k in want} == want
    if not ok:
        inject_double_extremes(args.base, args.dir, **PARAMS)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
