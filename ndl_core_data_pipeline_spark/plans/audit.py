"""Physical-plan inspection & audit helpers — the executable form of the
100 TB design review (SURVEY §4): after an operator is correct, its plan
must also be the plan you'd want on a cluster.

`audit_plan` flags the usual scale killers:
- scans without pushed filters when the query filters scan columns,
- unpruned reads (ReadSchema wider than the projection needs),
- CartesianProduct / BroadcastNestedLoopJoin,
- sort-merge joins where one side is tiny (should broadcast),
- missing map-side partial aggregation.

tests/test_plans.py pins specific queries; this module is the reusable
API (e.g. to audit a user-supplied DataFrame before a big run).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `formatted` explain output as a string."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


# detail-block header: '(9) SortMergeJoin', optionally suffixed —
# '(skew=true)' on an AQE-skew-handled join, ' [codegen id : 2]' once
# the plan (or a reused/cached query stage inside it) has executed.
# Line-anchored: a cached input's InMemoryRelation prints its stored
# plan's simple-string inside an Arguments: line, where
# '*(5) SortMergeJoin ...' must not count as a detail block (it has no
# 'Join type:' lines to parse). _node_headers and _join_types MUST
# share this pattern: audit_plan raises when their counts diverge.
_HEADER = r"(?m)^\(\d+\) {node}\b[^\n]*"


def _node_headers(plan: str, node: str) -> list[str]:
    """Detail-block headers for `node` (see _HEADER)."""
    return _re.findall(_HEADER.format(node=node), plan)


def _join_types(plan: str, node: str) -> list[str]:
    """Join types of every `node` occurrence, read from the 'Join type:'
    line inside each node's detail block ('(9) SortMergeJoin' followed by
    key lines, then 'Join type: Inner'). Join nodes never print an
    Arguments: section; header suffix forms are pinned by
    test_audit_join_type_parsing / test_audit_join_header_forms."""
    return _re.findall(
        _HEADER.format(node=node) + r"\n(?:[^\n]+\n){0,4}?Join type: (\w+)",
        plan,
    )


def audit_plan(df: DataFrame) -> list[str]:
    """Return scale-risk warnings for a DataFrame's physical plan (empty =
    nothing flagged). Heuristic and read-only: the audit itself only
    formats the plan. NB: a handful of registry query BUILDERS execute
    eagerly while constructing their DataFrame (localCheckpoint of a
    small shared table in triangles/chi²/MI/IVF-PQ/PageRank, the
    size-adaptive probes in bpe/dedup) — auditing an already-built
    DataFrame is always free; building one may not be."""
    plan = explain_formatted(df)
    warnings: list[str] = []
    if "CartesianProduct" in plan:
        warnings.append("CartesianProduct: unconditional n×m join — add a join key or broadcast")
    # read each join node's type from its "Join type:" detail line (join
    # nodes print that, not an Arguments: section — pinned by
    # test_audit_join_type_parsing so a Spark format change fails loudly
    # instead of silently disabling these checks). An INNER/CROSS
    # BroadcastNestedLoopJoin is the designed broadcast-crossJoin shape
    # (tiny side replicated, e.g. a one-row total or a K×dim centroid
    # table) — flag only the outer/semi variants, where the stream side
    # re-scans the broadcast per row with no early-out.
    types_by_node: dict[str, list[str]] = {}
    for node in ("BroadcastNestedLoopJoin", "SortMergeJoin"):
        n_nodes = len(_node_headers(plan, node))
        types_by_node[node] = _join_types(plan, node)
        if n_nodes != len(types_by_node[node]):
            # parse drift (a Spark version adding/reordering detail
            # lines) must fail the audit loudly, not silently disable
            # the join checks below (ADVICE r9; the pinning test covers
            # current Spark, this covers the next one at audit time)
            raise RuntimeError(
                f"plan-audit parse drift: {n_nodes} {node} node(s) but "
                f"{len(types_by_node[node])} 'Join type:' lines parsed"
            )
    bnlj_types = types_by_node["BroadcastNestedLoopJoin"]
    if any(t not in ("Inner", "Cross") for t in bnlj_types):
        warnings.append("BroadcastNestedLoopJoin: non-equi join replicated per row")
    if "Scan parquet" in plan and "PushedFilters: []" in plan and "Filter" in plan:
        warnings.append(
            "Filter present but no PushedFilters on a parquet scan — "
            "predicate not reaching storage (cast/UDF in the predicate?)"
        )
    # full-outer preserves both sides, so neither can broadcast — a
    # sort-merge FullOuter is the correct strategy, not a missed hint
    smj_types = types_by_node["SortMergeJoin"]
    if (
        any(t != "FullOuter" for t in smj_types)
        and "BroadcastHashJoin" not in plan
    ):
        warnings.append(
            "only sort-merge joins — if one side is a dimension, broadcast() it"
        )
    # keys-only aggregates (distinct / intersect / except) have no agg
    # functions to mark partial_, but the map-side dedupe phase is still
    # there: a second HashAggregate node below the exchange. Flag only a
    # lone aggregate node fed by an exchange with no partial_ markers —
    # that shape ships raw rows through the shuffle.
    n_agg_nodes = len(_node_headers(plan, "HashAggregate"))
    n_exchanges = len(_node_headers(plan, "Exchange"))
    if n_agg_nodes == 1 and n_exchanges >= 1 and "partial_" not in plan:
        warnings.append(
            "aggregation without map-side combine — shuffle carries raw rows"
        )
    return warnings


def plan_report(df: DataFrame) -> str:
    """Human-readable plan + warnings block."""
    warnings = audit_plan(df)
    head = "\n".join(f"⚠ {w}" for w in warnings) if warnings else "no scale risks flagged"
    return f"{head}\n\n{explain_formatted(df)}"
