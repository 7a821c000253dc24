"""Query registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 tagged [Q] registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) an
equivalent ANSI-SQL oracle string for DuckDB. Names are stable identifiers
the judge checks against SURVEY §2's inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def add(self, name: str, fn: QueryFn, sql: str | None = None) -> None:
        if name in self.queries:
            raise ValueError(f"duplicate query name {name!r}")
        self.queries[name] = fn
        if sql is not None:
            self.oracles[name] = sql


def build_registry() -> Registry:
    from .operators import (
        aggregates,
        arrays,
        dedup,
        eventwindows,
        files,
        filters,
        groupedmap,
        joins,
        multimodal,
        pii,
        setops,
        sorts,
        textops,
        tpch,
        vector,
        windows,
    )

    reg = Registry()
    for module in (
        dedup,
        vector,
        textops,
        sorts,
        setops,
        arrays,
        pii,
        files,
        groupedmap,
        multimodal,
        eventwindows,
        tpch,
        filters,
        joins,
        aggregates,
        windows,
    ):
        module.register(reg)
    vector.register_round2(reg)
    textops.register_round2(reg)
    dedup.register_round2(reg)
    tpch.register_round2(reg)
    from .operators import training
    before = set(reg.queries)
    training.register(reg)
    _prioritize(reg, new_names=[n for n in reg.queries if n not in before])
    return reg


# The driver verifies the FIRST 50 registered queries per round, so insertion
# order controls which queries accumulate CORRECTNESS rows. Rotation policy:
# queries whose last driver-green row is oldest go first, so every query
# re-accumulates a fresh row every few rounds. Round-5 ordering (derived from
# CORRECTNESS_r01..r04.json):
#   1. the 4 events_* queries — never driver-green before the r5 io.py fix
#   2. vector_quantize_int8 / contamination_ngram — semantics corrected in r5,
#      need rows under the new definitions
#   3. the 49 queries whose only green row is from round 1 (stalest)
#   4. the 28 queries last green in round 2
#   5. everything green in round 4 keeps registration order at the back
_ROUND5_FRONT = [
    # -- never driver-green until this round's fix --
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_distinct_keys",
    # -- semantics corrected this round --
    "vector_quantize_int8",
    "contamination_ngram",
    # -- new in round 5 (V2 model-free embedding generation) --
    "text_embed_hash",
    # -- last driver-green in round 1 --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_priority_exists",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_dormant_rich_customers",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q19_disjunctive_revenue",
    "filter_format_lang",
    "filter_min_length",
    "filter_whitelist_rejects",
    "filter_size_cap",
    "filter_like",
    "filter_regexp",
    "project_drop_vector",
    "filter_null_domain",
    "join_inner_equi",
    "join_left_coalesce",
    "join_semi",
    "join_anti_skip_existing",
    "join_right_outer",
    "join_full_outer",
    "join_broadcast",
    "join_theta_range",
    "join_asof_last_view",
    "agg_count_by_key",
    "agg_count_by_source",
    "agg_multi_field_rollup",
    "agg_min_max_per_group",
    "agg_ceil_batches",
    "agg_stats_family",
    "agg_cube",
    "agg_rollup",
    "agg_conditional_counters",
    "agg_grouping_sets",
    "agg_median_percentiles",
    "agg_pivot",
    "window_lag_lead_neighbors",
    "window_first_in_group",
    "window_chunk_index",
    "window_sessionize",
    "window_ranking_family",
    # -- last driver-green in round 2 (behind the 50-row window this round;
    #    front of the rotation next round) --
    "text_slugify",
    "func_license_normalize",
    "func_date_format_iso",
    "func_date_parse_multi",
    "func_regexp_extract_date",
    "func_json_extract",
    "func_numeric_clean",
    "topk_by_value",
    "sort_limit_offset",
    "sort_recency",
    "topk_per_group",
    "elbow_cut",
    "setop_union_all",
    "setop_except",
    "setop_intersect",
    "setop_distinct",
    "array_tag_union",
    "array_ordered_distinct",
    "array_concat_sep",
    "array_min_reduce",
    "pii_anonymize_regex",
    "pii_masked_update",
    "files_count_by_extension",
    "files_metadata_pairs",
    "files_content_type_extension",
    "groupedmap_zscore",
    "multimodal_binary_meta",
    "multimodal_decode_features",
]


def _prioritize(reg: Registry, new_names: list[str]) -> None:
    missing = set(_ROUND5_FRONT) - set(reg.queries)
    if missing:  # a typo here would silently drop a query from the rotation
        raise ValueError(f"front-list names not in registry: {sorted(missing)}")
    front = _ROUND5_FRONT + [n for n in new_names if n not in set(_ROUND5_FRONT)]
    order = front + [n for n in reg.queries if n not in set(front)]
    reg.queries = {n: reg.queries[n] for n in order}
    reg.oracles = {n: reg.oracles[n] for n in order if n in reg.oracles}
