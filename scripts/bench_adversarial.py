#!/usr/bin/env python
"""Adversarial-distribution scaling measurement (VERDICT r10 item 4).

The r10 sf1/sf3 sweeps used calibrated-but-uniform synthesis; real
100-TB corpora have hot keys and duplicate clusters. This runs the
keyed/skew-sensitive families against `.scale/skew1` (one bot user owns
~10% of events, Zipfian part/supp/cust keys) and the dedup families
against `.scale/dup1` (~50% near-duplicate documents AND embeddings),
each vs the UNIFORM `.scale/sf1` of identical row counts — so
t(adversarial)/t(uniform) isolates the DISTRIBUTION's cost, not scale.

A ratio near 1 = the plan is hot-key/duplicate-robust. For the banded
dedup families the script also records the MAX_BUCKET_MEMBERS guard's
drop accounting (oversize buckets, dropped members, candidate-pair
counts via Observation) — under dup-heavy data the cap is the mechanism
that keeps candidate generation from going quadratic, and its drops
must be OBSERVABLE, not silent.

Usage: python scripts/bench_adversarial.py [--out SCALE_ADVERSARIAL.json]
Env: SPARK_GRAFT_BENCH_REPS (default 2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark

UNIFORM = ".scale/sf1"
SKEW = ".scale/skew1"
DUP = ".scale/dup1"

# keyed / hot-key-sensitive families: per-user windows and state
# (sessionize, RFM ranks, funnel, markov, debounce), the explicitly
# salted join vs its skew target, the basket-affinity graph (Zipf part
# keys = hot baskets), and a keyed agg control
SKEW_QUERIES = [
    "window_sessionize",
    "events_rfm_scores",
    "events_funnel_steps",
    "events_markov_transitions",
    "events_debounce",
    "join_skew_salted",
    "join_range_binned",
    "graph_triangle_count",
    "agg_cube",
]

# banded/bucketed dedup families: candidate generation must stay bounded
# when half the corpus collides into the same buckets
DUP_QUERIES = [
    "dedup_exact_hash",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_minhash_clusters",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_join",
    "dedup_substring_spans",
    "dedup_embedding_lsh",
    "dedup_embedding_cosine",
]


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_ADVERSARIAL.json")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    for d in (UNIFORM, SKEW, DUP):
        if not os.path.exists(os.path.join(d, "MANIFEST.json")):
            raise SystemExit(
                f"{d} missing — generate with scripts/gen_scale.py first"
            )

    import __spark_entry__ as contract

    queries = contract.queries()
    spark = get_spark(app_name="ndlspark-adversarial", cpus=32,
                      shuffle_partitions=32)
    only = {n for n in args.only.split(",") if n}
    results: dict = {"skew": {}, "dup_heavy": {}, "guard_accounting": {}}
    if os.path.exists(args.out):  # resumable: a crash mid-sweep keeps
        with open(args.out) as fh:  # completed pairs (nulls_sweep pattern)
            prior = json.load(fh)
        for k in results:
            results[k].update(prior.get(k, {}))

    def persist():
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)

    try:
        run_one(queries["q6_forecast_revenue"], spark, UNIFORM)  # warm-up
        for label, names, adv_dir in (
            ("skew", SKEW_QUERIES, SKEW),
            ("dup_heavy", DUP_QUERIES, DUP),
        ):
            for name in names:
                if (only and name not in only) or name in results[label]:
                    continue
                # interleave uniform/adversarial so host weather cancels
                u_runs, a_runs = [], []
                for _ in range(reps):
                    u_runs.append(run_one(queries[name], spark, UNIFORM))
                    a_runs.append(run_one(queries[name], spark, adv_dir))
                u, a = min(u_runs), min(a_runs)
                results[label][name] = {
                    "uniform_sec": round(u, 3),
                    "adversarial_sec": round(a, 3),
                    "ratio": round(a / u, 2),
                }
                print(
                    f"{label} {name}: {u:.2f}s -> {a:.2f}s "
                    f"({a / u:.2f}x)",
                    file=sys.stderr,
                    flush=True,
                )
                persist()
        # MAX_BUCKET_MEMBERS guard accounting under dup-heavy data: the
        # number the verdict asked to see — how much the cap drops, and
        # how many candidate pairs still flow. The bucket frame is built
        # EXACTLY as minhash_near_dup_pairs builds it (collect_list,
        # which skips NULL doc_ids) and audited with the guard's own
        # dedup.oversize_buckets(), so these numbers cannot drift from
        # what _bucket_pairs actually drops. Skipped under --only.
        if not only and "minhash_dup_heavy" not in results["guard_accounting"]:
            from pyspark.sql import functions as F
            from pyspark.sql.observation import Observation

            from ndl_core_data_pipeline_spark.operators import dedup

            obs = Observation("dup_minhash")
            pairs = dedup.minhash_near_dup_pairs(spark, DUP, observation=obs)
            n_out = pairs.count()
            sigs = dedup.minhash_signatures(spark, DUP)
            buckets = (
                sigs.groupBy("j", "minhash")
                .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
                .filter(F.size("ids") > 1)
            )
            over = dedup.oversize_buckets(buckets, "ids").agg(
                F.count("*").alias("n_oversize"),
                F.coalesce(F.sum("n_members"), F.lit(0)).alias(
                    "dropped_members"
                ),
                F.coalesce(
                    F.sum(F.col("n_members") * (F.col("n_members") - 1) / 2),
                    F.lit(0),
                ).cast("bigint").alias("pairs_averted"),
            ).first()
            n_buckets = buckets.count()
            results["guard_accounting"]["minhash_dup_heavy"] = {
                "max_bucket_members": dedup.MAX_BUCKET_MEMBERS,
                "n_collision_buckets": n_buckets,
                "n_oversize_buckets": over["n_oversize"],
                "dropped_members": over["dropped_members"],
                "quadratic_pairs_averted": over["pairs_averted"],
                "candidate_pairs_generated": obs.get["n_candidate_pairs"],
                "scored_pairs_emitted": n_out,
            }
            persist()
            print(
                "guard: " + json.dumps(results["guard_accounting"]),
                file=sys.stderr,
                flush=True,
            )
    finally:
        spark.stop()
    persist()
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
