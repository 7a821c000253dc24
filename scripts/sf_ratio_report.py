#!/usr/bin/env python
"""Per-query time-scaling ratios between two volumetric parity sweeps
(round-18 verdict item 1: sf3 vs sf1 — correctness AND sublinearity
evidence at 300x the driver's correctness gate).

Round 19 (verdict item 2): parity_sweep now records a three-way
`secs_split` — engine-execute, oracle-execute, compare — per query, so
the scaling ratio is computed on ENGINE time alone when both sweeps
carry the split, with the wall ratio kept alongside. The r18 report
conflated engine + oracle + pandas-compare in one number, which made
compare-bound queries (window_running_sum's 14.8x was collect cost, not
plan cost) indistinguishable from real engine superlinearity.

Optionally merges per-query adjudication notes (--notes JSON:
{query: "verdict text"}) into the emitted artifact so flagged queries
carry their engine-vs-harness attribution inline.

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
    ap.add_argument("--notes", default=None,
                    help="JSON file {query: adjudication} merged per query")
    ap.add_argument("--out", default=".scale/sf3_vs_sf1_ratios.json")
    args = ap.parse_args()

    lo = json.load(open(args.lo))
    hi = json.load(open(args.hi))
    notes = json.load(open(args.notes)) if args.notes else {}
    rows: dict[str, dict] = {}
    for name, h in hi.items():
        if name.startswith("_") or not isinstance(h, dict):
            continue
        l = lo.get(name)
        if not l or "secs" not in h or "secs" not in l:
            continue
        wall = round(h["secs"] / l["secs"], 3) if l["secs"] else None
        row = {
            "lo_secs": l["secs"],
            "hi_secs": h["secs"],
            "wall_ratio": wall,
            "ok": bool(h.get("ok")),
        }
        ls, hs = l.get("secs_split"), h.get("secs_split")
        if ls and hs and ls.get("engine") and hs.get("engine"):
            row["lo_split"] = ls
            row["hi_split"] = hs
            row["engine_ratio"] = round(hs["engine"] / ls["engine"], 3)
        # engine ratio is the scaling evidence when available; wall
        # ratio is the (weaker) fallback for split-less checkpoints
        row["ratio"] = row.get("engine_ratio", wall)
        if name in notes:
            row["adjudication"] = notes[name]
        rows[name] = row
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"])
    if not ratios:
        print("no comparable entries (need `secs` in both artifacts)")
        sys.exit(2)
    n_split = sum(1 for r in rows.values() if "engine_ratio" in r)
    summary = {
        "n": len(ratios),
        "n_engine_split": n_split,
        "basis": "engine" if n_split == len(ratios) else (
            "mixed" if n_split else "wall"),
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
        eng = f" engine x{r['engine_ratio']}" if "engine_ratio" in r else ""
        print(
            f"{n:40s} {r['lo_secs']:8.2f}s -> {r['hi_secs']:8.2f}s  "
            f"wall x{r['wall_ratio']}{eng}"
        )


if __name__ == "__main__":
    main()
