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
import json
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
    args = ap.parse_args()

    import __spark_entry__ as contract

    from tests.oracle import compare

    queries = contract.queries()
    names = sorted(queries)

    spark = _session(16)
    results_a: dict[str, object] = {}
    for i, name in enumerate(names):
        try:
            results_a[name] = queries[name](spark, args.dir).toPandas()
        except Exception:
            results_a[name] = traceback.format_exc()[-800:]
        print(f"A[{i + 1}/{len(names)}] {name}", flush=True)
    spark.stop()

    spark = _session(37, {"spark.sql.files.maxPartitionBytes": "1m"})
    out: dict[str, dict] = {}
    for i, name in enumerate(names):
        a = results_a[name]
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
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    n_ok = sum(1 for r in out.values() if r["ok"])
    print(f"done: {n_ok}/{len(out)} ok")


if __name__ == "__main__":
    main()
