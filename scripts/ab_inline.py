#!/usr/bin/env python
"""Interleaved A/B for env-flag-toggled query variants, one session
(noise hits both arms equally). Usage:
    python scripts/ab_inline.py QUERY FLAG [--reps 6]
Times QUERY alternating FLAG=0 / FLAG=1 per rep pair.
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
    reps = 6
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    name, flag = args[0], args[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as contract

    fn = contract.queries()[name]
    spark = get_spark(app_name="ndlspark-ab", cpus=32, shuffle_partitions=32)
    try:
        # warm-up both arms
        for v in ("0", "1"):
            os.environ[flag] = v
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = {"0": [], "1": []}
        for r in range(reps):
            for v in ("0", "1") if r % 2 == 0 else ("1", "0"):
                os.environ[flag] = v
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                runs[v].append(dt)
                print(f"  rep{r} {flag}={v}: {dt:.3f}s", file=sys.stderr, flush=True)
        for v in ("0", "1"):
            rs = runs[v]
            print(
                f"{name} {flag}={v}: min={min(rs):.3f} median={statistics.median(rs):.3f}"
                f" (n={len(rs)})",
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
