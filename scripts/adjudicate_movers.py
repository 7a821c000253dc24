#!/usr/bin/env python
"""One-off r15 adjudication of the two r14 driver-run wide-ratio movers
(`dedup_embedding_lsh` 3.93->6.09, `agg_hll_distinct` 0.94->1.63).

The r14 driver bench flagged both >1.3x vs the committed baselines while
the builder's certify run minutes earlier on the identical tree saw zero
movers, and the r14 diff provably does not touch either data path.  This
script settles it with MORE interleaved pairs than bench.py uses (the
ratio machinery's documented noise mode is noisy-neighbor windows hitting
the interleaved reps themselves — more pairs shrink the median's
exposure): N_PAIRS A/B pairs per target vs the same q3 reference, in one
session, writing MOVER_ADJUDICATION_r15.json.

Verdict rule (from VERDICT r14): reproducible elevation -> profile the
LSH gram-tile stage; not reproducible -> refresh committed baselines with
a written adjudication.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from bench import RATIO_WIDE_REF, run_one  # noqa: E402
from ndl_core_data_pipeline_spark.session import get_spark  # noqa: E402

TARGETS = ["dedup_embedding_lsh", "agg_hll_distinct"]
# r13-committed (pre-driver-refresh) vs r14 driver-run values, from git
# history of bench_detail.json — recorded here so the artifact is
# self-contained.
HISTORY = {
    "dedup_embedding_lsh": {"r13_committed": 3.929, "r14_driver": 6.087},
    "agg_hll_distinct": {"r13_committed": 0.938, "r14_driver": 1.634},
}
N_PAIRS = int(os.environ.get("SPARK_GRAFT_ADJ_PAIRS", "7"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    queries = contract.queries()
    spark = get_spark(app_name="ndlspark-adjudicate", cpus=cpus, shuffle_partitions=cpus)
    out: dict = {"n_pairs": N_PAIRS, "ref": RATIO_WIDE_REF, "sf_dir": sf_dir}
    try:
        run_one(queries["q6_forecast_revenue"], spark, sf_dir)  # warm-up
        ref_fn = queries[RATIO_WIDE_REF]
        for name in TARGETS:
            fn = queries[name]
            refs, tgts, pair_ratios = [], [], []
            for i in range(N_PAIRS):
                r = run_one(ref_fn, spark, sf_dir)
                t = run_one(fn, spark, sf_dir)
                refs.append(round(r, 4))
                tgts.append(round(t, 4))
                pair_ratios.append(round(t / r, 3))
                print(f"{name} pair {i+1}/{N_PAIRS}: ref={r:.3f}s tgt={t:.3f}s "
                      f"ratio={t/r:.3f}", file=sys.stderr, flush=True)
            med = round(statistics.median(tgts) / statistics.median(refs), 3)
            out[name] = {
                **HISTORY[name],
                "refs": refs,
                "tgts": tgts,
                "pair_ratios": pair_ratios,
                "median_ratio": med,
                "raw_min": min(tgts),
                "raw_median": round(statistics.median(tgts), 4),
            }
            print(f"{name}: median wide_ratio = {med} "
                  f"(r13 committed {HISTORY[name]['r13_committed']}, "
                  f"r14 driver {HISTORY[name]['r14_driver']})",
                  file=sys.stderr, flush=True)
    finally:
        spark.stop()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "MOVER_ADJUDICATION_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v["median_ratio"] for k, v in out.items()
                      if isinstance(v, dict) and "median_ratio" in v}))


if __name__ == "__main__":
    main()
