#!/usr/bin/env python
"""Extreme-BIGINT parity sweep (round 16 post-close probe, rebuilt as a
committed axis): the full registry runs against an sf0.01 copy whose
integer columns carry extreme magnitudes — ±2^62, ±(2^63−1) and the
float64-unrepresentable 2^53+1 in int64 columns, the in-width analogs
(±(2^31−1), ±2^30, 2^24+1) in int32 columns — and every query must still
match its DuckDB oracle value-for-value.

This is the integer sibling of the extreme-finite-doubles probe
(EXTREME_r16.json): the failure field is CAST overflow divergence
(Spark's non-ANSI casts NULL/saturate where DuckDB raises), int→double
precision loss above 2^53 (GROUP BY / JOIN keys that collide after a
lossy widening), and derived-value explosions (a repeat/lpad count or a
synthetic string driven by a 2^62 key).

Identity columns keep the declared id contract — UNIQUE planted values
(see gen_scale.BIGINT_PK_COLS and checks.enforce_unique_key): the
round-16 ad-hoc probe planted COLLIDING ids and its 8 per-id-op
"divergences" were undefined same-id-different-payload merges, not
engine bugs. With the contract held, a red entry here is a real
magnitude bug.

Usage: python scripts/bigint_sweep.py [--out .scale/bigint_sweep.json]
         [--dir .scale/bigint0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"seed": 6263, "frac": 0.005}


def ensure_bigint_dataset(base: str, out: str) -> None:
    from gen_scale import inject_bigint_extremes

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "bigint-extreme-v2", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_bigint_extremes(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/bigint_sweep.json")
    ap.add_argument("--dir", default=".scale/bigint0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_bigint_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
