"""Physical-plan audits — the 100 TB posture as executable assertions.

Each check pins a property that keeps the query viable at scale: filters
reaching the parquet scan (no full-table decode), column pruning (no
wide reads for narrow projections), map-side partial aggregation (shuffle
carries aggregates, not rows), broadcast joins for dimension tables (no
fact-table shuffle for small sides), and TakeOrderedAndProject for top-k
(no global sort). A refactor that silently regresses one of these fails
here before it fails on a cluster.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as contract

from ndl_core_data_pipeline_spark.plans import audit_plan, explain_formatted

QUERIES = contract.queries()


def plan_of(spark, name, sf_dir) -> str:
    return explain_formatted(QUERIES[name](spark, sf_dir))


def test_q6_pushdown_and_pruning(spark, sf_small):
    plan = plan_of(spark, "q6_forecast_revenue", sf_small)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in plan
    # pruned read: exactly the 4 needed columns, no l_orderkey/l_tax/...
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    )
    # map-side combine before the single-partition exchange
    assert "partial_sum" in plan


def test_q3_broadcasts_dimensions(spark, sf_small):
    plan = plan_of(spark, "q3_shipping_priority", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # both join sides broadcast
    assert "TakeOrderedAndProject" in plan  # top-10, no global sort
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_q5_no_cartesian_and_broadcast_dims(spark, sf_small):
    plan = plan_of(spark, "q5_region_revenue", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # nation/region must broadcast
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q1_partial_aggregation(spark, sf_small):
    plan = plan_of(spark, "q1_pricing_summary", sf_small)
    assert "partial_sum" in plan and "partial_count" in plan
    assert "LessThanOrEqual(l_shipdate,1998-09-02" in plan


def test_topk_is_take_ordered(spark, sf_small):
    plan = plan_of(spark, "topk_by_value", sf_small)
    assert "TakeOrderedAndProject" in plan


def test_anti_join_stays_join(spark, sf_small):
    plan = plan_of(spark, "join_anti_skip_existing", sf_small)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_minhash_has_single_shuffle_to_signatures(spark, sf_small):
    # signatures = scan → repartition → explode → partial agg → exchange →
    # final agg → inline; no crossJoin, no extra exchange after the agg
    plan = plan_of(spark, "dedup_minhash_signatures", sf_small)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan  # map-side combine of the md5 mins


def test_minhash_pairs_single_pass(spark, sf_small):
    # pair generation is groupBy(bucket)→collect→explode, NOT a self-join:
    # the expensive shingle→md5→signature subtree must appear exactly once
    # (a self-join ran it once per side — 2× the scan/hash work at 100 TB)
    plan = plan_of(spark, "dedup_minhash_pairs", sf_small)
    assert plan.count("md5(") == 1
    assert "Join" not in plan  # no join operator of any kind
    assert "partial_min" in plan  # signature agg still map-side combined


def test_embedding_lsh_near_dup_no_cartesian(spark, sf_small):
    # candidates come from banded LSH buckets; the verify joins are keyed
    # on vec_id — the corpus must never cross-join itself, and the
    # hyperplanes must be plan-time literals
    plan = plan_of(spark, "dedup_embedding_lsh", sf_small)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "sequence(" not in plan  # literal hyperplane matrix


def test_ngram_jaccard_explodes_shingles_twice_not_thrice(spark, sf_small):
    # shingle stream feeds per-doc sizes + bucket pairs (2 subtrees); the
    # old self-join form computed it 3×. Pin ≤2 generator instances.
    plan = plan_of(spark, "dedup_ngram_jaccard", sf_small)
    assert plan.count("Generate explode") <= 2


def test_pii_is_map_only(spark, sf_small):
    plan = plan_of(spark, "pii_anonymize_regex", sf_small)
    assert "Exchange" not in plan  # pure scan→project, no shuffle


def test_audit_flags_cartesian(spark, sf_small):
    a = QUERIES["q6_forecast_revenue"](spark, sf_small)
    assert audit_plan(a) == []  # clean headline plan
    bad = (
        spark.range(10)
        .crossJoin(spark.range(10).withColumnRenamed("id", "id2"))
    )
    assert any("CartesianProduct" in w or "BroadcastNestedLoopJoin" in w
               for w in audit_plan(bad)) or "Broadcast" in explain_formatted(bad)


def test_audit_join_type_parsing(spark):
    """Round-9 review: the join checks once matched a detail syntax
    ('Arguments:') that join nodes never print, making both silently
    dead — the registry 'audits clean' because nothing could fire. Pin
    each check's POSITIVE direction against real plans so a Spark
    formatted-explain change disables them loudly."""
    a = spark.range(50).withColumnRenamed("id", "k")
    b = spark.range(50).withColumnRenamed("id", "k2")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj_only = a.join(b, a.k == b.k2)  # missed-broadcast shape
        assert any("sort-merge" in w for w in audit_plan(smj_only))
        full_outer = a.join(b, a.k == b.k2, "full_outer")  # exempt
        assert not any("sort-merge" in w for w in audit_plan(full_outer))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    outer_bnlj = a.join(F.broadcast(b), a.k < b.k2, "left")
    assert any("BroadcastNestedLoopJoin" in w for w in audit_plan(outer_bnlj))
    inner_bnlj = a.join(F.broadcast(b), a.k < b.k2)  # designed shape
    assert not any(
        "BroadcastNestedLoopJoin" in w for w in audit_plan(inner_bnlj)
    )


def test_audit_join_header_forms():
    """String-level pins for the two real detail-header forms plus the
    cached-input false positive (caught by the r9 loud parse-drift check
    in the r10 full suite): once a reused/cached query stage inside a
    plan has executed, its join headers gain a ' [codegen id : N]'
    suffix, and an InMemoryRelation input prints its stored plan's
    simple-string inside an Arguments: line where '*(5) SortMergeJoin'
    must count as neither a header nor a type."""
    from ndl_core_data_pipeline_spark.plans.audit import (
        _join_types,
        _node_headers,
    )

    plain = "(9) SortMergeJoin\nLeft keys [1]: [k]\nRight keys [1]: [k2]\nJoin type: Inner\n"
    codegen = "(76) BroadcastNestedLoopJoin [codegen id : 2]\nJoin type: Cross\nJoin condition: None\n"
    skew = "(12) SortMergeJoin(skew=true)\nLeft keys [1]: [k]\nRight keys [1]: [k2]\nJoin type: Inner\n"
    embedded = "Arguments: [*(5) SortMergeJoin [k#1L], [k2#2L], Inner\n]\n"
    assert _join_types(plain, "SortMergeJoin") == ["Inner"]
    assert _join_types(codegen, "BroadcastNestedLoopJoin") == ["Cross"]
    assert _join_types(skew, "SortMergeJoin") == ["Inner"]
    assert len(_node_headers(plain, "SortMergeJoin")) == 1
    assert len(_node_headers(codegen, "BroadcastNestedLoopJoin")) == 1
    assert len(_node_headers(skew, "SortMergeJoin")) == 1
    assert _node_headers(embedded, "SortMergeJoin") == []
    assert _join_types(embedded, "SortMergeJoin") == []


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    # co-located join: both sides bucketed on the key → SortMergeJoin with
    # NO Exchange in the plan (the 100 TB repeated-join strategy: shuffle
    # once at write, never per query)
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.sinks import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed(
        load(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", ["l_orderkey"], 8, path=str(tmp_path / "b_lineitem"),
    )
    write_bucketed(
        load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders", ["o_orderkey"], 8, path=str(tmp_path / "b_orders"),
    )
    # sf0.001 is broadcast-sized, which would bypass bucketing entirely —
    # disable auto-broadcast so the plan shows the big-big join strategy
    # the buckets exist for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            on=spark.table("b_lineitem").l_orderkey
            == spark.table("b_orders").o_orderkey,
        )
        plan = explain_formatted(j)
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        n_bucketed = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # sanity: matches the unbucketed result
    n_plain = (
        load(spark, sf_small, "lineitem")
        .join(load(spark, sf_small, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n_bucketed == n_plain


def test_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    # data written partitionBy(key) → a reader filtering on that key must
    # scan only the matching directories (PartitionFilters, not a full
    # scan + post-filter) — at 100 TB this is the difference between
    # reading one partition and reading everything
    from ndl_core_data_pipeline_spark.io import load

    out = str(tmp_path / "by_flag")
    load(spark, sf_small, "lineitem").write.partitionBy(
        "l_returnflag"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = explain_formatted(back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert "(l_returnflag" in plan.split("PartitionFilters:")[1][:120]
    n = back.count()
    assert n == load(spark, sf_small, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).count()
    assert n > 0


def test_q8_broadcast_dims_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "q8_market_share", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # nation x2 / region / supplier dims
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan  # year window pushed


def test_q9_part_filter_pushed(spark, sf_small):
    plan = plan_of(spark, "q9_product_profit", sf_small)
    assert "CartesianProduct" not in plan
    # the %gear% LIKE must reach the part scan, not sit above the join
    assert "StringContains(p_name,gear)" in plan


def test_q21_single_fact_scan(spark, sf_small):
    # the sole-late-supplier rollup must scan/join lineitem exactly once —
    # the naive EXISTS/NOT-EXISTS form re-executes the join subtree
    plan = plan_of(spark, "q21_waiting_suppliers", sf_small)
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_embed_hash_pruned_scan_and_partial_agg(spark, sf_small):
    # feature-hash embedder: 2-column pruned scan, map-side partial sums
    # into ONE keyed exchange, then the doc-keyed normalize window; no
    # join of any kind
    plan = plan_of(spark, "text_embed_hash", sf_small)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "partial_sum" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_q2_window_min_broadcast_dims(spark, sf_small):
    # the correlated scalar subquery decorrelates to ONE pass: window-min
    # over the region-restricted set, dims broadcast, no second lineitem scan
    plan = plan_of(spark, "q2_min_cost_supplier", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # lineitem scanned ONCE (5 file indexes: l/s/n/r/p), not once per subquery
    assert plan.count("Location: InMemoryFileIndex") <= 5
    assert "TakeOrderedAndProject" in plan  # LIMIT 100, no global sort


def test_q11_threshold_is_broadcast_scalar(spark, sf_small):
    plan = plan_of(spark, "q11_part_value_threshold", sf_small)
    # the uncorrelated total joins as a broadcast of ONE row, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # map-side combine on the per-part sums


def test_q20_not_exists_is_anti_join(spark, sf_small):
    plan = plan_of(spark, "q20_clean_part_suppliers", sf_small)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the 'gear' part filter reaches the part scan
    assert "StringContains(p_name,gear)" in plan or "p_name" in plan


def test_tfidf_keyed_joins_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "text_tfidf_topk", sf_small)
    assert "CartesianProduct" not in plan
    # the N-docs scalar rides a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # map-side combine on both count aggs


def test_bigram_nll_model_is_dataframe(spark, sf_small):
    plan = plan_of(spark, "text_bigram_nll", sf_small)
    assert "CartesianProduct" not in plan
    # scoring joins the count tables on their keys (shuffled hash or
    # broadcast depending on stats) — never a nested-loop over the corpus.
    # One BNLJ instance (the single-row V scalar) prints twice in the
    # formatted plan (tree line + detail section).
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_block_rewrite_no_self_join(spark, sf_small):
    plan = plan_of(spark, "dedup_block_rewrite", sf_small)
    assert "CartesianProduct" not in plan
    # ONE documents scan feeds both the rank and the reassembly sides
    assert plan.count("Location: InMemoryFileIndex") <= 2


def test_range_binned_is_prefix_sum(spark, sf_small):
    # the ±1 h aggregate must ride the prefix-sum decomposition: NO join
    # ever touches the view×purchase pair space (the r6 bin-equi-join
    # materialized candidate pairs, which grow with temporal density² —
    # 61x per 10x rows in the r10 sf1 measurement). The only join is the
    # broadcast of the #buckets-row offset table; cumulative state moves
    # through bucket-keyed windows.
    plan = plan_of(spark, "join_range_binned", sf_small)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # pair-space joins gone
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1  # offsets only
    assert "Window" in plan  # bucket-keyed cumulative
    assert "partial_sum" in plan  # map-side combine under the final agg


def test_salted_join_spreads_key(spark, sf_small):
    plan = plan_of(spark, "join_skew_salted", sf_small)
    assert "CartesianProduct" not in plan
    # salt explode on the profile side (Generate) + equi-join on the
    # composite (user_id, salt) key
    assert "explode(" in plan
    assert "salt" in plan


def test_merge_upsert_single_shuffle_join(spark, sf_small):
    plan = plan_of(spark, "merge_upsert_latest", sf_small)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    # base and change-set must co-partition on the key: exactly one join
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 1


def test_histogram_reads_one_column(spark, sf_small):
    plan = plan_of(spark, "agg_value_histogram", sf_small)
    # bucket is derived from value — the scan must read ONLY value
    assert "ReadSchema: struct<value:double>" in plan
    assert "partial_count" in plan and "partial_sum" in plan


def test_mode_two_level_agg_no_window(spark, sf_small):
    plan = plan_of(spark, "agg_mode_per_group", sf_small)
    # counts collapse map-side; the argmax is max_by aggregation, not a
    # row_number window over the count table
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "ReadSchema: struct<c_nationkey:int,c_mktsegment:string>" in plan


def test_token_entropy_partial_aggs(spark, sf_small):
    plan = plan_of(spark, "text_token_entropy", sf_small)
    assert "partial_count" in plan and "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_pq_adc_broadcasts_lut_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "vector_pq_adc_topk", sf_small)
    assert "CartesianProduct" not in plan
    # the M×K query lookup table and the codebook both ride broadcasts
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort


def test_bm25_broadcast_stats_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "text_bm25_topk", sf_small)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_funnel_shuffles_on_user_only(spark, sf_small):
    plan = plan_of(spark, "events_funnel_steps", sf_small)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # every exchange is keyed on user_id — no other shuffle key appears
    import re

    for args in re.findall(r"hashpartitioning\(([^,]+),", plan):
        assert args.strip().startswith("user_id"), args


def test_cohort_partial_distinct(spark, sf_small):
    plan = plan_of(spark, "events_cohort_retention", sf_small)
    assert "CartesianProduct" not in plan
    assert "partial_count(distinct " in plan or "partial_count" in plan


def test_aqe_coalesces_shuffle_partitions(spark, sf_small):
    # runtime re-plan: a keyed agg launched with an oversized partition
    # count must come back coalesced by AQE after execution — the runtime
    # guard against the fixed shuffle.partitions being wrong at any given
    # scale factor
    from ndl_core_data_pipeline_spark.io import load

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        df = (
            load(spark, sf_small, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("q"))
        )
        df.collect()  # AQE finalizes only on execution
        executed = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert "AQEShuffleRead" in executed and "coalesced" in executed


def test_aqe_splits_skewed_join_partition(spark, sf_small):
    # one hot key (90%+ of the left side) with thresholds forced low: AQE
    # must mark the sort-merge join skew-handled ("skew=true") instead of
    # leaving the hot key on one reducer
    left = spark.range(0, 40_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x"), F.col("id")).alias("payload"),
    )
    right = spark.range(0, 40_000).select(F.col("id").alias("k"), F.lit(1).alias("r"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = left.join(right, "k")
        j.collect()
        executed = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
    assert "skew=true" in executed


def test_substring_spans_ship_hashes_not_text(spark, sf_small):
    # r19: the duplicated-gram filter is a per-gh window count over ONE
    # evaluation of the gram subtree — the former count-agg + broadcast
    # semi join re-executed the md5 gram scan per consumer (2 scans) and
    # broadcast an unbounded dup-gram set
    plan = plan_of(spark, "dedup_substring_spans", sf_small)
    assert "CartesianProduct" not in plan
    import re

    # formatted explain prints each scan once in the tree and once in the
    # detail list — count the numbered detail entries
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "BroadcastExchange" not in plan  # no data-dependent broadcast
    assert "Window" in plan  # per-gh count + interval-merge windows


def test_pipeline_summary_two_shuffles_only(spark, sf_small):
    # dedup groupBy(fp) + the final split rollup (plus their AQE reads):
    # the composed pipeline must not introduce extra exchanges, and the
    # only join is the keep-first semi join
    plan = plan_of(spark, "pipeline_corpus_summary", sf_small)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert plan.count("Exchange hashpartitioning") <= 3  # fp, semi-join key, split


def test_url_normalize_is_map_only(spark, sf_small):
    plan = plan_of(spark, "func_url_normalize", sf_small)
    assert "Exchange" not in plan  # pure scan → project regex chain


def test_gaps_islands_single_user_shuffle(spark, sf_small):
    plan = plan_of(spark, "window_gaps_islands", sf_small)
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # distinct + window + island rollup all hash on o_custkey
    import re

    keys = {a.strip().split("#")[0] for a in re.findall(r"hashpartitioning\(([^,]+),", plan)}
    assert keys <= {"o_custkey", "d", "island"}


def test_incremental_dedup_ships_hashes(spark, sf_small):
    # r19: the semi/anti PAIR folded into ONE LeftOuter join with a
    # marker column (base fp is distinct, so the outer join cannot
    # multiply rows) and the fingerprint pass is checkpointed — the pin
    # now asserts the single-join form and that fingerprints, not text,
    # remain the join key
    import re

    plan = plan_of(spark, "dedup_incremental_vs_base", sf_small)
    assert "CartesianProduct" not in plan
    assert "LeftOuter" in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "fp#" in plan  # the checkpointed md5 fingerprint is the join key
    # no text COLUMN refs ship post-checkpoint (r19 ADVICE: match column
    # refs with a regex, not the brittle substring/replace hack)
    assert not re.search(r"\btext#\d+", plan)
    # r19 ADVICE: the lazy localCheckpoint truncates the visible plan to
    # an ExistingRDD scan, hiding the fingerprint subtree — additionally
    # pin the PRE-checkpoint shape (fp built exactly as the query builds
    # it, minus the checkpoint): md5-over-normalized-text computed in
    # the scan projection, so only 16-byte hashes would ever reach the
    # join even on a lineage-recompute fallback
    from pyspark.sql import functions as F

    from ndl_core_data_pipeline_spark.io import load

    docs = load(spark, sf_small, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp_plan = explain_formatted(docs.select("doc_id", F.md5(norm).alias("fp")))
    assert "md5" in fp_plan
    assert "Exchange" not in fp_plan  # fingerprinting is map-side only
    assert re.search(r"ReadSchema:.*text", fp_plan)  # scan reads text once


def test_constraint_report_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "quality_constraint_report", sf_small)
    assert "CartesianProduct" not in plan
    assert plan.count("LeftAnti") >= 2  # both FK rules are anti-joins


def test_mv_incremental_single_key_shuffle(spark, sf_small):
    # base and delta aggregate on the SAME key, so the merge plan is two
    # partial-agg branches plus one full-outer join — every exchange hashes
    # on the custkey column (aliased _bk/_dk for the null-safe merge) and
    # no row-level orders data crosses twice
    plan = plan_of(spark, "mv_incremental_agg", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan  # eqNullSafe must stay hashable
    assert "partial_count" in plan and "partial_sum" in plan
    import re

    keys = {a.strip().split("#")[0] for a in re.findall(r"hashpartitioning\(([^,]+),", plan)}
    # the null-safe merge partitions on coalesce(key, 0) + isnull(key) —
    # Spark's standard eqNullSafe hash form, still single-key per side
    assert keys <= {"o_custkey", "coalesce(_bk", "coalesce(_dk"}


def test_bloom_prune_narrow_scan_and_semi(spark, sf_small):
    # probe scan reads exactly the 3 needed lineitem columns; the bitmap
    # arrives by single-row broadcast (never a CartesianProduct); the
    # FP-correction is a broadcast semi join; probe hashing is in-plan
    plan = plan_of(spark, "join_bloom_pruned", sf_small)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert "xxhash64" in plan  # bitmap probe inside codegen, not a UDF
    assert (
        "ReadSchema: struct<l_suppkey:bigint,l_extendedprice:double,"
        "l_discount:double>" in plan
    )


def test_heavy_hitters_tail_never_shuffles_raw(spark, sf_small):
    # MG summaries are map-side (MapInPandas), candidates broadcast back
    # for the exact recount. r20: the recount is ONE keyed aggregation —
    # non-candidate tokens collapse into a NULL group via the broadcast
    # left-join marker (the former LeftSemi + separate global count), so
    # map-side partial aggregation still ships <= C+2 rows per task and
    # the tail never reaches the shuffle. The <= C+2-row result is
    # lazily checkpointed, which truncates the FINAL plan to an
    # ExistingRDD — so pin the pre-checkpoint recount subtree directly
    # (same construction, minus the checkpoint) plus the final shape.
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.operators import warehouse as WH
    from ndl_core_data_pipeline_spark.operators._util import (
        rebalance_narrow_scan,
    )

    docs = rebalance_narrow_scan(
        load(spark, sf_small, "documents").select("text"), spark
    )
    cand = docs.mapInPandas(WH._mg_candidates, "token string").distinct()
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    marked = toks.join(
        F.broadcast(cand.withColumn("_c", F.lit(1))), "token", "left"
    )
    grouped = marked.groupBy(
        F.when(F.col("_c") == 1, F.col("token")).alias("token")
    ).agg(F.count("*").alias("cnt"))
    pre = explain_formatted(grouped)
    assert "MapInPandas" in pre
    assert "BroadcastHashJoin" in pre  # candidate marker join
    assert "SortMergeJoin" not in pre  # the token stream never shuffles
    assert "partial_count" in pre  # tail collapsed map-side
    # final plan: both consumers read ONE checkpointed RDD, no rescan
    plan = plan_of(spark, "agg_heavy_hitters", sf_small)
    # formatted explain lists each node in the tree AND the detail section
    assert plan.count("Scan ExistingRDD") == 4
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_zorder_topk_no_global_sort(spark, sf_small):
    plan = plan_of(spark, "sort_zorder_cluster", sf_small)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # no full-sort materialization


def test_zonemap_is_one_keyed_agg(spark, sf_small):
    plan = plan_of(spark, "layout_zonemap_stats", sf_small)
    assert "partial_min" in plan and "partial_max" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Window" not in plan  # z-prefix cells, not ntile


def test_fuzzy_pairs_block_join_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "join_fuzzy_name_pairs", sf_small)
    assert "CartesianProduct" not in plan  # blocked, never all-pairs
    assert "levenshtein" in plan  # exact verify inside codegen


def test_tree_depth_closed_form_is_map_only(spark, sf_small):
    # round 7: the implicit-heap walk is closed-form bit arithmetic —
    # the plan must be a pure scan→project, zero shuffles, zero joins
    plan = plan_of(spark, "graph_tree_depth_root", sf_small)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_tree_doubling_over_edges_keyed_joins_only(spark, sf_small):
    # the general explicit-edge walk: lineage cut per round (checkpoint
    # scan in the final plan), and each doubling self-join keyed, never
    # cartesian
    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.operators.graphs import (
        tree_depth_over_edges,
    )

    edges = load(spark, sf_small, "part").select(
        F.col("p_partkey").cast("bigint").alias("node"),
        F.expr(
            "CASE WHEN p_partkey = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((p_partkey - 1) DIV 2 AS BIGINT) END"
        ).alias("parent"),
    )
    plan = explain_formatted(tree_depth_over_edges(edges, rounds=2))
    assert "Scan ExistingRDD" in plan  # lineage actually cut

    one_round = (
        edges.alias("a")
        .join(edges.alias("b"), F.col("a.parent") == F.col("b.node"))
        .select(F.col("a.node"), F.col("b.parent"))
    )
    round_plan = explain_formatted(one_round)
    assert "CartesianProduct" not in round_plan
    assert "BroadcastNestedLoopJoin" not in round_plan


def test_hof_family_is_map_only(spark, sf_small):
    plan = plan_of(spark, "array_hof_family", sf_small)
    assert "Exchange" not in plan  # lambdas evaluate in-row, no explode


def test_unpivot_expand_then_partial_agg(spark, sf_small):
    plan = plan_of(spark, "reshape_unpivot", sf_small)
    assert "Expand" in plan  # unpivot is a map-side row expansion
    assert "partial_count" in plan
    assert plan.count("Exchange (") == 1  # only the rollup shuffles


def test_quantile_bin_broadcasts_fences(spark, sf_small):
    plan = plan_of(spark, "feature_quantile_bin", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_prefix_sum_data_windows_are_bucket_keyed(spark, sf_small):
    # the two-level prefix-sum: every data-touching stage keyed by day;
    # only the #buckets-row offset scan may serialize
    plan = plan_of(spark, "window_distributed_prefix_sum", sf_small)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(day" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BroadcastHashJoin" in plan


def test_session_paths_user_keyed_then_takeordered(spark, sf_small):
    plan = plan_of(spark, "events_session_paths", sf_small)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan  # sessionize + path build
    assert "TakeOrderedAndProject" in plan  # top-20, no global sort
    assert "partial_count" in plan  # trigram rollup map-side combined


def test_kmeans_final_round_is_arrow_assign_plus_keyed_mean(spark, sf_small):
    # r20: the fit runs as a driver loop (bounded K×dim state; jobs
    # outside this plan), the FINAL round is the query plan — one
    # Arrow-native argmin pass + the keyed per-(cell, dim) mean. No
    # joins, no broadcast chain, exactly one exchange (the mean).
    plan = plan_of(spark, "vector_kmeans_centroids", sf_small)
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan
    assert "MapInArrow" in plan  # the argmin crossed to numpy
    assert "partial_sum" in plan  # per-(cell,dim) means map-side combined


def test_map_family_is_map_only(spark, sf_small):
    plan = plan_of(spark, "func_map_family", sf_small)
    assert "Exchange" not in plan  # in-row map expressions, no shuffle


def test_chi_square_marginals_broadcast(spark, sf_small):
    plan = plan_of(spark, "stats_chi_square", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # marginal tables broadcast
    assert "SortMergeJoin" not in plan


def test_frequent_pairs_no_self_join(spark, sf_small):
    # pairs come from the in-row combination expansion over bounded
    # baskets — an order-keyed self-join would square the fact table
    plan = plan_of(spark, "mine_frequent_pairs", sf_small)
    assert "Join" not in plan
    assert "partial_count" in plan  # pair rollup map-side combined


def test_calendar_densify_spine_broadcast(spark, sf_small):
    plan = plan_of(spark, "calendar_densify", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_feature_standardize_stats_broadcast(spark, sf_small):
    plan = plan_of(spark, "feature_standardize", sf_small)
    assert "BroadcastHashJoin" in plan  # G-row stats table broadcast
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan  # Σx/Σx² map-side combined


def test_one_hot_vocab_broadcast(spark, sf_small):
    plan = plan_of(spark, "feature_one_hot", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_count_keyed_joins_only(spark, sf_small):
    plan = plan_of(spark, "graph_triangle_count", sf_small)
    assert "CartesianProduct" not in plan
    # wedge + closure are keyed equi-joins; only the two 1-row count
    # tables may meet in a broadcast nested loop
    assert plan.count("BroadcastNestedLoopJoin (") <= 1


def test_ivfpq_broadcasts_every_small_side(spark, sf_small):
    plan = plan_of(spark, "vector_ivfpq_adc_search", sf_small)
    # centroids / codebooks / query LUT are all broadcast; the only
    # cross joins are K-row broadcast expansions, never a shuffle cross
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # codebook + LUT equi-joins
    assert "SortMergeJoin" not in plan


def test_mad_outliers_broadcasts_fences(spark, sf_small):
    plan = plan_of(spark, "filter_mad_outliers", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kwic_is_map_only(spark, sf_small):
    plan = plan_of(spark, "text_kwic_contexts", sf_small)
    assert "Exchange" not in plan  # scan → regexp scan → explode, no shuffle


def test_pagerank_no_cartesian_and_partial_agg(spark, sf_small):
    plan = plan_of(spark, "graph_pagerank", sf_small)
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # contribution sums map-side combined


def test_hll_sketch_is_two_keyed_aggs(spark, sf_small):
    plan = plan_of(spark, "agg_hll_distinct", sf_small)
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan  # register max map-side combined


def test_countmin_matrix_partial_agg(spark, sf_small):
    plan = plan_of(spark, "agg_countmin_sketch", sf_small)
    assert "Exchange" in plan
    assert "partial_count" in plan


def test_jaccard_prefix_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "dedup_jaccard_prefix_join", sf_small)
    assert "CartesianProduct" not in plan


def test_interval_overlap_is_bin_equijoin(spark, sf_small):
    plan = plan_of(spark, "join_interval_overlap", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # bin key makes it a hash join


def test_pmi_vocab_broadcast(spark, sf_small):
    plan = plan_of(spark, "text_cooccur_pmi", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # vocab semi-join side


def test_rolling_stats_single_keyed_window(spark, sf_small):
    plan = plan_of(spark, "window_rolling_stats", sf_small)
    assert "CartesianProduct" not in plan
    # the frame runs keyed on user_id — never a global single-partition
    # window (which would serialize the table at 100 TB)
    assert "partitionspec(user_id" in plan.lower().replace(" ", "") or (
        "Window" in plan and "user_id" in plan
    )


def test_winsorize_broadcasts_fences(spark, sf_small):
    plan = plan_of(spark, "feature_winsorize", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_pairs_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "text_tfidf_doc_pairs", sf_small)
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # dots map-side combined


def test_profile_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "profile_table_stats", sf_small)
    assert "CartesianProduct" not in plan


def test_profile_shuffles_independent_of_column_count(spark, sf_small):
    """VERDICT r8 item 6: profile_columns melts to (column_name, v) pairs
    and aggregates once, so a wide profile costs the same constant number
    of exchanges as a narrow one (the old per-column-subplan shape added
    an aggregation per column — linear jobs on a 1000-column table)."""
    from ndl_core_data_pipeline_spark.operators.warehouse import profile_columns

    df = spark.read.parquet(f"{sf_small}/orders.parquet")

    def n_exchanges(k):
        prof = profile_columns(
            df, {c: F.col(c).cast("string") for c in df.columns[:k]}
        )
        return explain_formatted(prof).count("Exchange (")

    narrow, wide = n_exchanges(2), n_exchanges(8)
    assert narrow == wide
    # melt agg + total + rollup + name-anchor broadcast + output sort
    assert wide <= 6


def test_pit_scd2_keyed_join_only(spark, sf_small):
    plan = plan_of(spark, "join_point_in_time_scd2", sf_small)
    assert "CartesianProduct" not in plan


def test_debounce_no_cartesian_partial_agg(spark, sf_small):
    plan = plan_of(spark, "events_debounce", sf_small)
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # burst rollup map-side combined


def test_trend_partial_agg_before_window(spark, sf_small):
    plan = plan_of(spark, "trend_weekly_growth", sf_small)
    assert "partial_sum" in plan  # weekly rollup combines map-side
    assert "CartesianProduct" not in plan


def test_markov_broadcast_marginals(spark, sf_small):
    plan = plan_of(spark, "events_markov_transitions", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_matryoshka_take_ordered(spark, sf_small):
    plan = plan_of(spark, "vector_matryoshka_topk", sf_small)
    assert "TakeOrderedAndProject" in plan  # both cuts, never global sorts


def test_snapshot_diff_single_key_join(spark, sf_small):
    plan = plan_of(spark, "snapshot_diff_summary", sf_small)
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan


def test_recall_report_no_cartesian(spark, sf_small):
    plan = plan_of(spark, "vector_ann_recall_report", sf_small)
    assert "CartesianProduct" not in plan


def test_cusum_keyed_windows_only(spark, sf_small):
    plan = plan_of(spark, "window_cusum_drift", sf_small)
    assert "CartesianProduct" not in plan
    assert "event_type" in plan  # windows keyed, never empty-partition


def test_bottomk_keyed_window_then_percentiles(spark, sf_small):
    plan = plan_of(spark, "agg_bottomk_sample_quantiles", sf_small)
    assert "CartesianProduct" not in plan


def test_hll_merge_partial_max(spark, sf_small):
    plan = plan_of(spark, "agg_hll_merge", sf_small)
    assert "partial_max" in plan  # register folds map-side combined
    assert "CartesianProduct" not in plan


def test_cube_expands_base_cuboid_not_fact_rows(spark, sf_small):
    """Round-9 two-level cube/rollup: the Expand node (one copy of its
    input per grouping set) must sit ABOVE the base aggregation, so only
    the tiny cuboid multiplies — a regression to the direct form would
    put Expand right over the scan and push the fact table through the
    shuffle once per grouping set."""
    for name in ("agg_cube", "agg_rollup", "agg_grouping_sets"):
        plan = plan_of(spark, name, sf_small)
        assert "Expand" in plan, name
        if "Scan parquet" not in plan:
            # round-13 form: the base cuboid is localCheckpoint-ed (the
            # grand-total row now comes from a separate global-aggregate
            # branch for empty-input totality, and the checkpoint keeps
            # the fact table scanned ONCE in the construction job) — no
            # parquet scan in the final plan is the strongest form of
            # "Expand never feeds on raw fact rows"
            continue
        # formatted plans list the tree root-first: the scan-side partial
        # aggregate must appear BELOW (after) the Expand line, i.e. the
        # expand consumes an aggregate, not the scan
        first_expand = plan.index("Expand")
        scan = plan.index("Scan parquet")
        agg_before_expand = "HashAggregate" in plan[first_expand:scan]
        assert agg_before_expand, f"{name}: Expand feeds on raw scan rows"


def test_registry_wide_plan_audit_clean(spark, sf_small):
    """Round-9 closure of the plan-audit loop: audit_plan flags ZERO scale
    risks across every registered query — no cartesian products, no
    outer/semi nested-loop joins, no pushdown-less filtered parquet scans,
    no broadcast-less SMJ-only plans (full-outer exempt: neither side of a
    preserved-both join can broadcast), no combiner-less aggregations.
    Per-query tests above pin specific shapes; this sweep pins the floor
    for queries added later. The audit reads plans only, but a few query
    BUILDERS run real jobs while constructing their DataFrame (eager
    localCheckpoints in triangles/chi²/MI, size-adaptive probes), so the
    sweep is plan-only in what it checks, not free in what it builds."""
    from collections import defaultdict

    flagged = defaultdict(list)
    for name, fn in QUERIES.items():
        for w in audit_plan(fn(spark, sf_small)):
            flagged[name].append(w)
    assert not flagged, dict(flagged)
