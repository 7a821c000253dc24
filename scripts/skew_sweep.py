#!/usr/bin/env python
"""Hot-key skew correctness sweep (round 15, VERDICT item 3 — the
seventh robustness axis): the full registry runs against an sf0.01 copy
where ONE value carries ~50% of the rows in every skew-relevant column
(scripts/gen_scale.py inject_hotkey — hot join keys, hot group keys,
one minhash/LSH band bucket holding half the corpus), and every query
must still match its DuckDB oracle value-for-value.

The salted-join (join_skew_salted), banded-dedup caps
(MAX_BUCKET_MEMBERS) and Misra-Gries heavy-hitter paths exist precisely
for this data shape, but before this sweep only their TIMING was
measured (SCALE_ADVERSARIAL_r11, 0.79-1.38x) — never cross-engine
correctness under a hot key, and a capped bucket silently dropping
pairs is exactly the bug class caps invite. The fixture deliberately
stays UNDER the caps (~250-member buckets vs MAX_BUCKET_MEMBERS=4096)
so engine-vs-oracle comparison is exact; cap-triggering blow-ups are
observable via observe() and remain a documented deviation.

Usage: python scripts/skew_sweep.py [--out .scale/skew_sweep.json]
         [--dir .scale/hotkey0.01] [--base /root/testdata/sf0.01]
         [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PARAMS = {"seed": 1503, "frac": 0.5}


def ensure_hotkey_dataset(base: str, out: str) -> None:
    """Build the fixture if missing or if its manifest no longer matches
    the injection parameters (empty_sweep's manifest pattern). The
    manifest's `planted` audit map is ignored for staleness — the
    parameters determine it. One PARAMS dict feeds both the builder and
    the staleness check (review finding: a hardcoded `want` that relies
    on the builder's defaults staying in sync rebuilds forever the day
    they drift)."""
    from gen_scale import inject_hotkey

    manifest = os.path.join(out, "MANIFEST.json")
    want = {"mode": "hotkey", "base": base, **PARAMS}
    if os.path.exists(manifest):
        with open(manifest) as fh:
            got = json.load(fh)
        if {k: got.get(k) for k in want} == want:
            return
        print(f"rebuilding {out}: manifest is stale", flush=True)
    inject_hotkey(base, out, **PARAMS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/skew_sweep.json")
    ap.add_argument("--dir", default=".scale/hotkey0.01")
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    ensure_hotkey_dataset(args.base, args.dir)

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
