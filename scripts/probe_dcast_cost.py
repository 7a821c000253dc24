#!/usr/bin/env python
"""Isolate the dcast guard's scan-bound cost (round-18 item 2).

Round 17 wired the exact-integer contract (`_util.dcast`: a per-row
finite/|x|>=2^53/|x|<bound guard plus a conditional hi/lo decomposition)
into dsum/davg; q1 runs seven of them over the full lineitem scan and
certify's mover report flagged its wide_ratio 1.21->1.66. This probe
measures the guard's ISOLATED cost on clean sf1 data: the identical q1
aggregation expressed (a) with dsum/davg as shipped, (b) with plain
SUM(CAST(x AS DECIMAL(25,6))) — semantically equal on clean data, where
no value reaches 2^53.

Best-of-N medians per variant, interleaved A/B/A/B to cancel host
weather. Result informs whether a static-domain fast path is worth its
complexity (>5% threshold per the verdict).

Usage: python scripts/probe_dcast_cost.py [--dir .scale/sf1] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir, guarded: bool):
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.operators._util import DEC, davg, dsum

    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    if guarded:
        aggs = [
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
        ]
    else:
        def psum(c, a):
            return F.sum(c.cast(DEC)).cast("double").alias(a)

        def pavg(c, a):
            return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(a)

        aggs = [
            psum(F.col("l_quantity"), "sum_qty"),
            psum(F.col("l_extendedprice"), "sum_base_price"),
            psum(disc_price, "sum_disc_price"),
            psum(charge, "sum_charge"),
            pavg(F.col("l_quantity"), "avg_qty"),
            pavg(F.col("l_extendedprice"), "avg_price"),
            pavg(F.col("l_discount"), "avg_disc"),
        ]
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs, F.count("*").alias("count_order"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/sf1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=".scale/dcast_cost.json")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.dir, "lineitem.parquet")):
        from sf_parity_sweep import ensure_sf_dataset

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        ensure_sf_dataset(args.dir, 10)

    from ndl_core_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dcast-cost", cpus=32, shuffle_partitions=32)
    # warm both plans once (codegen + file listing), then interleave
    for g in (True, False):
        build(spark, args.dir, g).collect()
    times: dict[str, list[float]] = {"guarded": [], "plain": []}
    for _ in range(args.reps):
        for key, g in (("guarded", True), ("plain", False)):
            t0 = time.monotonic()
            rows = build(spark, args.dir, g).collect()
            times[key].append(time.monotonic() - t0)
    med_g = statistics.median(times["guarded"])
    med_p = statistics.median(times["plain"])
    # value check: identical on clean data
    a = {tuple(r[:2]): r[2:] for r in build(spark, args.dir, True).collect()}
    b = {tuple(r[:2]): r[2:] for r in build(spark, args.dir, False).collect()}
    same = a == b
    res = {
        "dir": args.dir,
        "reps": args.reps,
        "guarded_times": times["guarded"],
        "plain_times": times["plain"],
        "guarded_median_s": med_g,
        "plain_median_s": med_p,
        "overhead_ratio": med_g / med_p if med_p else None,
        "values_identical_on_clean": same,
    }
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
