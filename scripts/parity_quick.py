#!/usr/bin/env python
"""Targeted oracle parity for named queries at one or more SF dirs —
the optimization round's fast equivalence check after restructuring a
query (round rule: a restructure must be proven against the oracle
before moving on).

Usage:
    python scripts/parity_quick.py QUERY [QUERY ...] [--sf sf0.001,sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark
from tests.oracle import run_compare


def main() -> None:
    args = sys.argv[1:]
    sfs = ["sf0.001", "sf0.01"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    names = args
    if not names:
        print("usage: parity_quick.py QUERY [QUERY ...] [--sf sf0.001,sf0.01]")
        sys.exit(2)

    import __spark_entry__ as contract

    queries = contract.queries()
    oracles = contract.oracle_sql()
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"not in registry: {missing}")
        sys.exit(2)

    spark = get_spark(app_name="ndlspark-parity-quick", cpus=32)
    failures = 0
    try:
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            for name in names:
                t0 = time.monotonic()
                problems = run_compare(
                    spark, name, queries[name], oracles.get(name), sf_dir
                )
                secs = time.monotonic() - t0
                status = "ok" if not problems else "FAIL"
                print(f"{sf} {name}: {status} ({secs:.1f}s)", flush=True)
                for p in problems:
                    failures += 1
                    print(f"    {p[:500]}")
    finally:
        spark.stop()
    print(f"{'ALL GREEN' if not failures else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
