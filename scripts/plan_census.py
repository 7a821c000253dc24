#!/usr/bin/env python
"""Whole-registry formatted-plan census — the optimization round's
breadth tool (guide §1/§7.2): for every registry query, build the
DataFrame (no execution), capture the formatted physical plan, and
count the shape-relevant nodes (scans, exchanges, join strategies,
Python-boundary nodes, cartesian products). Also times the driver-side
construction+analysis cost per query (guide §7.3 — plan-building time
was a real, measured cost class this round: lsh/simhash).

Usage: python scripts/plan_census.py [--out .scale/plan_census.json]
         [--sf-dir /root/testdata/sf0.1] [--only a,b]
"""

from __future__ import annotations

import argparse
import io
from contextlib import redirect_stdout
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark

MARKS = [
    ("scans", r"Scan parquet"),
    ("exchanges", r"\bExchange\b"),
    ("broadcast_exchanges", r"BroadcastExchange"),
    ("smj", r"SortMergeJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("bhj", r"BroadcastHashJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("py_eval", r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas"),
    ("window", r"\bWindow\b"),
    ("sort", r"\bSort\b"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/plan_census.json")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import __spark_entry__ as contract

    queries = contract.queries()
    names = [n for n in queries if not args.only or n in args.only.split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ndlspark-plan-census", cpus=cpus, shuffle_partitions=cpus)
    out = {}
    try:
        for name in names:
            t0 = time.perf_counter()
            try:
                df = queries[name](spark, args.sf_dir)
                # public API captured via redirect (r19 ADVICE: the
                # former df._sc._jvm.PythonSQLUtils call breaks across
                # minor versions and under Spark Connect)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain(mode="formatted")
                plan = buf.getvalue()
            except Exception as e:  # noqa: BLE001 — census must not abort on one query
                out[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
                continue
            build_s = round(time.perf_counter() - t0, 3)
            row = {"build_s": build_s, "plan_chars": len(plan)}
            for key, pat in MARKS:
                row[key] = len(re.findall(pat, plan))
            out[name] = row
            print(
                f"{name}: build={build_s}s scans={row['scans']} exch={row['exchanges']}"
                f" smj={row['smj']} bnlj={row['bnlj']} cart={row['cartesian']} py={row['py_eval']}",
                flush=True,
            )
    finally:
        spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out} ({len(out)} queries)")


if __name__ == "__main__":
    main()
