#!/usr/bin/env python
"""Run the full registry against the NULL-injected sf0.01 copy and
record per-query pass/fail incrementally (resumable: re-running skips
names already recorded unless --redo). Aggregation tool behind
tests/test_nulls_parity.py — the committed artifact is NULLS_r11.json.

Usage: python scripts/nulls_sweep.py [--out .scale/nulls_sweep.json]
                                     [--dir .scale/nulls0.01]
                                     [--only name1,name2] [--redo]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/nulls_sweep.json")
    ap.add_argument("--dir", default=".scale/nulls0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as contract
    from pyspark.sql import SparkSession

    from tests.oracle import run_compare

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from _sweeplib import load_results, save_results

    queries, oracles = contract.queries(), contract.oracle_sql()
    # ALWAYS load the checkpoint: --redo re-runs the selected names but
    # must not discard results outside the selection (a subset
    # `--only x --redo` used to rewrite the file with only x).
    # load_results additionally discards the whole checkpoint when its
    # engine-tree stamp is stale and prunes renamed/removed queries.
    results: dict[str, dict] = load_results(args.out, valid_keys=queries)
    only = {n for n in args.only.split(",") if n}
    names = [n for n in sorted(queries) if not only or n in only]
    for i, name in enumerate(names):
        if name in results and not (only or args.redo):
            continue
        try:
            problems = run_compare(
                spark, name, queries[name], oracles.get(name), args.dir
            )
            results[name] = {"ok": not problems, "problems": problems}
        except Exception as e:
            results[name] = {
                "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
                "trace": traceback.format_exc()[-1500:],
            }
        status = "ok" if results[name]["ok"] else "FAIL"
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
        save_results(args.out, results)
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"done: {n_ok}/{len(results)} ok")


if __name__ == "__main__":
    main()
