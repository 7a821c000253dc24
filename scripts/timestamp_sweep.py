#!/usr/bin/env python
"""Extreme-timestamp parity sweep (round 16, the temporal sibling of the
extreme-BIGINT and extreme-finite-double axes): the full registry runs
against an sf0.01 copy whose timestamp columns carry extreme in-range
instants — year 1, year 9999, the 1582 Gregorian-gap dates, epoch zero,
the last microsecond before the epoch (negative-epoch floor-division
bait), and the int32-epoch rollover; nanosecond-precision columns get
the ns-representable analog set — and every query must still match its
DuckDB oracle value-for-value.

The failure field: strftime/rendering of years outside [1000, 9999]
(zero-padding, '+' prefixes), date arithmetic crossing the DateType
edge (9999-12-31 + 30 days), epoch_us/floor division below the epoch,
date_trunc/quarter at year 1, and session-tz interaction (the config
sweep's tz_tokyo variant re-runs on this fixture's base shape).

Usage: python scripts/timestamp_sweep.py [--out .scale/timestamp_sweep.json]
         [--dir .scale/tsx0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = {"seed": 9461, "frac": 0.005}


def ensure_timestamp_dataset(base: str, out: str) -> None:
    from gen_scale import inject_timestamp_extremes

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "timestamp-extreme", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_timestamp_extremes(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/timestamp_sweep.json")
    ap.add_argument("--dir", default=".scale/tsx0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_timestamp_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
