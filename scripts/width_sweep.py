#!/usr/bin/env python
"""Shuffle-width invariance sweep (round 12, second determinism axis):
every registry query must return the same result multiset when the
SAME input runs under a different shuffle width and scan-split size.
The row-permutation sweep (order_sweep.py) varies MAP-side arrival
order; this one varies REDUCE-side composition — how many tasks an
aggregation/window/join fans into and how partial results merge back
together — which is where collect_list order, unordered first()/
any_value(), and float merge order hide. On a real cluster both knobs
move run-to-run (AQE coalescing, dynamic allocation), so dependence on
either is a latent wrong answer at scale.

Phase A runs all queries at shuffle.partitions=16 (the sweep default)
and holds canonical results in memory; phase B restarts the session at
a coprime width (37) with 1 MiB scan splits and compares.

Usage: python scripts/width_sweep.py [--dir .scale/nulls0.01]
                                     [--out .scale/width_sweep.json]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(partitions: int, extra: dict | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/nulls0.01")
    ap.add_argument("--out", default=".scale/width_sweep.json")
    ap.add_argument("--ckpt", default=".scale/width_a")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    import pandas as pd

    import __spark_entry__ as contract

    from tests.oracle import compare

    from _sweeplib import ensure_fresh_ckpt_dir, load_results, save_results

    queries = contract.queries()
    names = sorted(queries)

    # phase A checkpoints each canonical result to disk (review finding:
    # holding all 221 frames only in driver memory meant ANY phase-B
    # crash discarded the full phase-A run; the sibling order_sweep.py
    # checkpoints per query and this now matches). The dir carries an
    # engine-tree manifest: baselines pickled on an older tree are wiped
    # rather than compared against new-code phase-B results.
    ensure_fresh_ckpt_dir(args.ckpt)

    def _apath(n: str) -> str:
        return os.path.join(args.ckpt, f"{n}.pkl")

    spark = _session(16)
    for i, name in enumerate(names):
        if os.path.exists(_apath(name)) and not args.redo:
            continue
        try:
            pd.to_pickle(queries[name](spark, args.dir).toPandas(), _apath(name))
        except Exception:
            pd.to_pickle(traceback.format_exc()[-800:], _apath(name))
        print(f"A[{i + 1}/{len(names)}] {name}", flush=True)
    spark.stop()

    spark = _session(37, {"spark.sql.files.maxPartitionBytes": "1m"})
    # tree-stamped + registry-pruned (stale results discarded on load)
    out: dict[str, dict] = {} if args.redo else load_results(
        args.out, valid_keys=queries
    )
    for i, name in enumerate(names):
        if name in out and not args.redo:
            continue
        a = pd.read_pickle(_apath(name))
        if isinstance(a, str):
            out[name] = {"ok": False, "error": f"phase A failed: {a[:400]}"}
            continue
        try:
            b = queries[name](spark, args.dir).toPandas()
            problems = compare(a, b)
            out[name] = {"ok": not problems, "problems": problems}
        except Exception as e:
            out[name] = {
                "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
                "trace": traceback.format_exc()[-1200:],
            }
        status = "ok" if out[name]["ok"] else "FAIL"
        print(f"B[{i + 1}/{len(names)}] {name}: {status}", flush=True)
        save_results(args.out, out)
    n_ok = sum(1 for r in out.values() if r["ok"])
    print(f"done: {n_ok}/{len(out)} ok")


if __name__ == "__main__":
    main()
