#!/usr/bin/env python
"""DuckDB oracle-stability sweep (round 12): run every oracle N times on
the dirty dataset and flag any whose result multiset varies run to run.

Motivation: DuckDB 1.0 applies the default_null_order pragma (and even
an explicit NULLS FIRST) inconsistently across window execution paths —
the same window query over the same parquet flips between NULLS-FIRST
and NULLS-LAST outcomes run to run (found via a flaky
trend_weekly_growth dirty-parity test; single-threaded execution is
deterministic but picks the WRONG order). Any oracle that sorts a
NULLABLE key inside an OVER clause or an ORDER BY aggregate is exposed
on dirty data. Clean driver data has no NULL sort keys, so the driver's
own comparisons are unaffected; this sweep is about the dirty tiers.

The fix for flagged oracles is to make sort keys non-null with sentinel
COALESCE (matching Spark's NULLS FIRST position), making DuckDB's null
order irrelevant.

Usage: python scripts/oracle_stability_sweep.py [--dir .scale/nulls0.01]
         [--reps 6] [--out .scale/oracle_stability.json] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/nulls0.01")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", default=".scale/oracle_stability.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as contract

    from tests.oracle import _canon, duckdb_conn

    from _sweeplib import load_results, save_results

    oracles = contract.oracle_sql()
    # ALWAYS load the checkpoint: --redo re-runs the selected names but
    # must not discard results outside the selection (a subset
    # `--only x --redo` used to rewrite the file with only x).
    # load_results additionally discards the whole checkpoint when its
    # engine-tree stamp is stale and prunes renamed/removed queries.
    results: dict[str, dict] = load_results(args.out, valid_keys=oracles)
    only = {n for n in args.only.split(",") if n}
    unknown = only - set(oracles)
    if unknown:  # a typo must fail loudly, not print a stale success line
        raise SystemExit(f"--only names not in the registry: {sorted(unknown)}")
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    names = [n for n in sorted(oracles) if not only or n in only]
    for i, name in enumerate(names):
        # a cached entry only counts if it was produced with AT LEAST the
        # requested rep count (rerunning at higher reps must re-execute,
        # not re-report 6-rep results as a 10-rep certification)
        cached = results.get(name)
        if (
            cached is not None
            and cached.get("reps", 0) >= args.reps
            and not (only or args.redo)
        ):
            continue
        hashes = set()
        err = None
        try:
            for _ in range(args.reps):
                con = duckdb_conn(args.dir)
                try:
                    df = con.execute(oracles[name]).df()
                finally:
                    con.close()
                hashes.add(
                    hash(tuple(map(tuple, _canon(df).astype(str).values)))
                )
        except Exception as e:
            err = f"{type(e).__name__}: {str(e)[:300]}"
        results[name] = {
            "stable": err is None and len(hashes) == 1,
            "n_distinct_outcomes": len(hashes),
            "reps": args.reps,
            "error": err,
        }
        status = "ok" if results[name]["stable"] else "UNSTABLE"
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
        save_results(args.out, results)
    n_ok = sum(1 for r in results.values() if r["stable"])
    print(f"done: {n_ok}/{len(results)} stable")


if __name__ == "__main__":
    main()
