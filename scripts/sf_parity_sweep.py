#!/usr/bin/env python
"""Volumetric whole-registry parity sweep — STANDING GATE as of round 17.

Round 16 ran the registry's first oracle runs above the driver's sf0.01
gate as one-off attestations: 221/221 at sf0.1 (PARITY_SF01_r16.json)
and 218/221 at sf1 (PARITY_SF1_r16.json) where all three residuals were
comparator/tooling classes, not semantics. Round 17 closes both classes
— the comparator grew a 2-ULP relative float band (tests/oracle.py
REL_TOL) and an aggregate-checksum tier for unboundedly-large results
(checksum_compare; join_theta_range's O(n²) multiset is digested per
p_partkey instead of collected) — so sf1 parity can run clean and
become the per-round 100×-scale correctness check: the strongest
standing guard against scale-dependent semantics drift (an operator
whose answer changes when row counts grow 100×, a cap that silently
truncates, a skew path that activates only at volume).

The sf1 fixture is synthesized by scripts/gen_scale.py --mult 10 from
the same generator recipe as the driver's testdata (seed 4242, ~6M
lineitem rows) and regenerates deterministically if the driver wipes
`.scale/`.

Usage: python scripts/sf_parity_sweep.py [--out .scale/sf1_parity.json]
         [--dir .scale/sf1] [--mult 10] [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"mult": 10, "seed": 4242, "skew": False, "dup_heavy": False}


def ensure_sf_dataset(out: str, mult: int) -> None:
    from gen_scale import gen

    manifest = os.path.join(out, "MANIFEST.json")
    want = {**PARAMS, "mult": mult}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    gen(mult, out, PARAMS["seed"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/sf1_parity.json")
    ap.add_argument("--dir", default=".scale/sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_sf_dataset(args.dir, args.mult)

    from _sweeplib import CHECKSUM_QUERIES, parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(
        args.dir, args.out, only=only, redo=args.redo, checksum=CHECKSUM_QUERIES
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
