#!/usr/bin/env python
"""Capture .explain("formatted") for bench headliners (or a named subset)
into plans/r20/<query>_<tag>.txt — the optimization round's before/after
plan evidence (guide §1 / §7.2).

Usage:
    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

With no query names, captures every bench headliner. Plans are captured
at sf0.1 (the bench scale) on the bench's session settings so the shapes
match what the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as contract
    import bench

    queries = contract.queries()
    if not names:
        names = list(bench.BENCH_QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r20",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="ndlspark-plans", cpus=cpus, shuffle_partitions=cpus)
    try:
        for name in names:
            if name not in queries:
                print(f"SKIP {name}: not in registry", file=sys.stderr)
                continue
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
