#!/usr/bin/env python
"""Per-query wall-time scaling ratios between two volumetric parity
sweeps (round-18 verdict item 1: sf3 vs sf1 — correctness AND
sublinearity evidence at 300x the driver's correctness gate).

Reads the `secs` column parity_sweep records per checkpoint entry and
emits {query: {lo_secs, hi_secs, ratio}} plus summary percentiles.
A ratio far above the row-count multiple flags a superlinear operator —
the exact class that works at sf0.01 and dies at 100 TB.

Usage: python scripts/sf_ratio_report.py --lo .scale/sf1_parity.json \
         --hi .scale/sf3_parity.json --mult 3 \
         --out .scale/sf3_vs_sf1_ratios.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default=".scale/sf1_parity.json")
    ap.add_argument("--hi", default=".scale/sf3_parity.json")
    ap.add_argument("--mult", type=float, default=3.0,
                    help="row-count multiple hi/lo (linear-work reference)")
    ap.add_argument("--out", default=".scale/sf3_vs_sf1_ratios.json")
    args = ap.parse_args()

    lo = json.load(open(args.lo))
    hi = json.load(open(args.hi))
    rows: dict[str, dict] = {}
    for name, h in hi.items():
        if name.startswith("_") or not isinstance(h, dict):
            continue
        l = lo.get(name)
        if not l or "secs" not in h or "secs" not in l:
            continue
        ratio = round(h["secs"] / l["secs"], 3) if l["secs"] else None
        rows[name] = {
            "lo_secs": l["secs"],
            "hi_secs": h["secs"],
            "ratio": ratio,
            "ok": bool(h.get("ok")),
        }
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"])
    if not ratios:
        print("no comparable entries (need `secs` in both artifacts)")
        sys.exit(2)
    summary = {
        "n": len(ratios),
        "mult": args.mult,
        "median_ratio": round(statistics.median(ratios), 3),
        "p90_ratio": round(ratios[int(0.9 * (len(ratios) - 1))], 3),
        "max_ratio": ratios[-1],
        "n_above_mult": sum(1 for r in ratios if r > args.mult),
        # theta's O(n²) output is the one DESIGNED superlinear query;
        # anything else above mult² deserves a look
        "superlinear": sorted(
            (n for n, r in rows.items()
             if r["ratio"] and r["ratio"] > args.mult * args.mult),
        ),
    }
    with open(args.out, "w") as fh:
        json.dump({"queries": rows, "summary": summary}, fh, indent=1)
    top = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))[:12]
    print(json.dumps(summary))
    for n, r in top:
        print(f"{n:40s} {r['lo_secs']:8.2f}s -> {r['hi_secs']:8.2f}s  x{r['ratio']}")


if __name__ == "__main__":
    main()
