#!/usr/bin/env python
"""Heavy-tail scaling measurement: run the most expensive registry
queries at sf0.1 AND at a locally synthesized ~sf1 (scripts/gen_scale.py,
10x rows in every table) and report the per-query time ratio.

The interesting number is t(sf1)/t(sf0.1) per query: a 10x-rows run on
32 local cores should land well under 10x wall-clock for every query
whose plan is genuinely keyed/banded (partial aggregation, bounded
candidate generation); anything at or above ~10x is doing super-linear
work and gets a plan fix or an explicit documented cap.

Best-of-N (default 3) per query per scale, interleaved is NOT needed
here (both scales run in one JVM, same session) but order is
sf0.1-first so page-cache warmup favors neither direction on the sf1
numbers we care about.

Usage: python scripts/bench_scale.py [query ...]
Env: SPARK_GRAFT_SCALE_DIR (default .scale/sf1), SPARK_GRAFT_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark

# the 12 most expensive queries per BENCH_r09.json, covering every
# heavy family: vector (ivfpq/kmeans/pq), dedup (minhash x3, simhash,
# substring, jaccard-prefix), text (tfidf all-pairs), graph (triangles)
HEAVY = [
    "vector_ivfpq_adc_search",
    "dedup_simhash_pairs",
    "graph_triangle_count",
    "dedup_minhash_clusters",
    "dedup_minhash_pairs",
    "dedup_minhash_signatures",
    "dedup_substring_spans",
    "dedup_jaccard_prefix_join",
    "text_tfidf_doc_pairs",
    "vector_kmeans_centroids",
    "vector_pq_adc_topk",
    "agg_cube",
]


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:] or HEAVY
    small = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_SCALE_DIR", ".scale/sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as contract

    queries = contract.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        raise KeyError(f"not in registry: {missing}")

    spark = get_spark(app_name="ndlspark-bench-scale", cpus=cpus, shuffle_partitions=cpus)
    try:
        run_one(queries["q6_forecast_revenue"], spark, small)  # warm-up
        out: dict[str, dict] = {}
        for name in names:
            t_small = min(run_one(queries[name], spark, small) for _ in range(reps))
            t_big = min(run_one(queries[name], spark, big) for _ in range(reps))
            ratio = round(t_big / t_small, 2)
            out[name] = {
                "sf0.1": round(t_small, 3),
                "sf1": round(t_big, 3),
                "ratio": ratio,
            }
            print(
                f"scale {name}: {t_small:.2f}s -> {t_big:.2f}s  ({ratio}x per 10x rows)",
                file=sys.stderr,
                flush=True,
            )
        print(json.dumps({"reps": reps, "big_dir": big, "queries": out}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
