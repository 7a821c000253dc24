#!/usr/bin/env python
"""IVF nprobe recall/cost frontier at sf1 (round-19, VERDICT r18 item 6).

The r18 retune moved IVF_NPROBE 2 -> 4 to clear the mean-recall 0.6
floor; certify's bench tail moved vector_ivf_probe 0.12 -> 0.159 s.
This probe commits the frontier behind that adjudication: for nprobe in
{2, 4} it measures, on the same sf1 fixture the recall gate uses,

  * candidate count (rows surviving the probed-cell semi-join — the
    fraction of the corpus the exact rerank touches), and
  * wall time of the full ivf_topk query (best of 2, collect included),

so the quality-for-cost trade is a recorded artifact, not a comment.

Usage: python scripts/probe_ivf_nprobe_cost.py [--dir .scale/sf1]
         [--out .scale/ivf_nprobe_cost.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/sf1")
    ap.add_argument("--out", default=".scale/ivf_nprobe_cost.json")
    ap.add_argument("--nprobes", default="2,4")
    args = ap.parse_args()

    from sf_parity_sweep import ensure_sf_dataset

    ensure_sf_dataset(args.dir, 10)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from _sweeplib import save_results
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.operators import vector

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    n_corpus = load(spark, args.dir, "embeddings").count()
    orig = vector.IVF_NPROBE
    results: dict[str, dict] = {}
    try:
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            vector.IVF_NPROBE = nprobe
            # candidate set = corpus members of the probed cells minus
            # the query row — the exact prefix ivf_topk reranks over
            emb = load(spark, args.dir, "embeddings")
            cents = vector._centroid_arrays(emb).cache()
            q = emb.filter(F.col("vec_id") == 0).select(
                F.col("embedding").alias("q_emb")
            )
            probed = (
                cents.crossJoin(F.broadcast(q))
                .select(
                    "cell_id",
                    vector._sq_l2(F.col("q_emb"), F.col("centroid")).alias("qd2"),
                )
                .orderBy("qd2", "cell_id")
                .limit(nprobe)
                .select("cell_id")
            )
            members = vector.ivf_cell_assignments(
                spark, args.dir, cents=cents
            ).join(F.broadcast(probed), "cell_id", "left_semi")
            n_cand = (
                emb.join(members, "vec_id", "left_semi")
                .filter(F.col("vec_id") != 0)
                .count()
            )
            times = []
            for _ in range(2):
                t0 = time.monotonic()
                rows = vector.ivf_topk(spark, args.dir).collect()
                times.append(round(time.monotonic() - t0, 3))
            cents.unpersist()
            results[f"nprobe_{nprobe}"] = {
                "ok": len(rows) == 10,
                "nprobe": nprobe,
                "candidates": n_cand,
                "corpus": n_corpus,
                "candidate_fraction": round(n_cand / n_corpus, 4),
                "topk_secs_best_of_2": min(times),
                "topk_secs_all": times,
            }
            print(json.dumps(results[f"nprobe_{nprobe}"]))
    finally:
        vector.IVF_NPROBE = orig
    save_results(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    ), results)


if __name__ == "__main__":
    main()
