#!/usr/bin/env python
"""A/B timing for named queries with the bench's methodology (noop sink,
bench session settings, warm-up) — the optimization round's
isolate-one-query stopwatch (guide §1.4).

Usage:
    python scripts/time_queries.py QUERY [QUERY ...] [--reps 5] [--sf-dir DIR]

Prints per-query min/median over reps; per-run times on stderr.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args
    if not names:
        print("usage: time_queries.py QUERY [QUERY ...] [--reps N] [--sf-dir DIR]")
        sys.exit(2)

    import __spark_entry__ as contract

    queries = contract.queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ndlspark-time", cpus=cpus, shuffle_partitions=cpus)
    try:
        # warm-up to absorb JVM/codegen startup (bench methodology)
        queries["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in names:
            fn = queries[name]
            runs = []
            spark.sparkContext.setJobDescription(f"time: {name}")
            for r in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                runs.append(dt)
                print(f"  {name} run{r}: {dt:.3f}s", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name}: min={min(runs):.3f} median={statistics.median(runs):.3f}"
                f" (reps={reps})",
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
