#!/usr/bin/env python
"""Duplicate-ROW parity sweep (round 16 continuation): the full registry
runs against an sf0.01 copy where ~30% of every table's rows are
PAYLOAD-IDENTICAL rows under FRESH ids (sampled with replacement — some
payloads appear 3+ times; every appended row gets a new id, MANIFEST
mode 'duprows-rekeyed'), and every query must still match its DuckDB
oracle value-for-value. This is the retry/re-crawl shape a real ingest
produces: same content, new identity.

This is the empirical registry-wide test of the totality contract's
exemption clause: every reviewed window/LIMIT sort key claims ties
beyond the key are "fully duplicate rows, whose swap is
output-invariant" — here 30% of ALL rows form such ties at every site
simultaneously. It also exercises count-sensitive semantics under
multiplicity: DISTINCT-vs-COUNT splits, basket pair counts, df caps,
sketch and sampling ties, dedup families whose INPUT is now itself
duplicated. Duplicate IDS — even with byte-identical payloads — are
OUTSIDE the declared id contract: the first form of this probe planted
exactly those and 11 queries diverged (see inject_duprows' docstring),
so checks.enforce_unique_key rejects every duplicated id and re-keying
(or exact dedup) at ingest is the required remedy.

Usage: python scripts/duprow_sweep.py [--out .scale/duprow_sweep.json]
         [--dir .scale/duprow0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"seed": 3141, "frac": 0.3}


def ensure_duprow_dataset(base: str, out: str, params: dict | None = None) -> None:
    from gen_scale import inject_duprows

    params = params or PARAMS
    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "duprows-rekeyed", "base": base, **params}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_duprows(base, out, **params)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/duprow_sweep.json")
    ap.add_argument("--dir", default=".scale/duprow0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    # density-escalation rung (round-17 verdict item 6): e.g.
    #   python scripts/duprow_sweep.py --frac 0.6 --seed 3151 \
    #     --dir .scale/duprow60_0.01 --out .scale/duprow60_sweep.json
    ap.add_argument("--frac", type=float, default=PARAMS["frac"])
    ap.add_argument("--seed", type=int, default=PARAMS["seed"])
    args = ap.parse_args()

    ensure_duprow_dataset(
        args.base, args.dir, params={"seed": args.seed, "frac": args.frac}
    )

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
