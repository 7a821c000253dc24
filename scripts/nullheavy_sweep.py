#!/usr/bin/env python
"""High-NULL-density parity sweep — STANDING GATE as of round 16.

Round 15 ran this density as a one-off escalation probe
(NULLHEAVY_r15.json): raising the dirty tier's per-column NULL density
from 2% to 30% surfaced ten cross-engine semantic gaps the certified
2% tier structurally cannot see — tie-collision probability on
(ts, event_id)-style sort keys scales quadratically with density, so
the both-NULL tie groups that break non-total window ORDER BYs only
materialize at high density. The ten divergences (plus one the probe
passed by arrival-order luck) were fixed at the close of r15; round 16
promotes the tier from probe to certified gate: same fixture recipe
(seed 7121, 30% NULL / 2% NaN / 2% empty), full-registry sweep,
tree-stamped checkpoint counted by certify_round like every other axis.

Usage: python scripts/nullheavy_sweep.py [--out .scale/nullheavy_sweep.json]
         [--dir .scale/nullheavy0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {
    "seed": 7121,
    "frac_null": 0.3,
    "frac_nan": 0.02,
    "frac_empty": 0.02,
    "frac_inf": 0.0,
    "frac_negzero": 0.0,
}


def ensure_nullheavy_dataset(base: str, out: str) -> None:
    from gen_scale import inject_nulls

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "nulls", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_nulls(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/nullheavy_sweep.json")
    ap.add_argument("--dir", default=".scale/nullheavy0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_nullheavy_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
