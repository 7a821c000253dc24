#!/usr/bin/env python
"""Run the full registry against the NULL-injected sf0.01 copy and
record per-query pass/fail incrementally (resumable: re-running skips
names already recorded unless --redo; checkpoints are engine-tree
stamped via _sweeplib). Aggregation tool behind
tests/test_nulls_parity.py — the committed artifact is NULLS_r11.json.

Usage: python scripts/nulls_sweep.py [--out .scale/nulls_sweep.json]
                                     [--dir .scale/nulls0.01]
                                     [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/nulls_sweep.json")
    ap.add_argument("--dir", default=".scale/nulls0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    from _sweeplib import parity_sweep

    only = frozenset(n for n in args.only.split(",") if n)
    n_bad = parity_sweep(args.dir, args.out, only=only, redo=args.redo)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
