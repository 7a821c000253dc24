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


def audit_plan(df: DataFrame) -> list[str]:
    """Return scale-risk warnings for a DataFrame's physical plan (empty =
    nothing flagged). Heuristic, read-only, cheap — no execution."""
    plan = explain_formatted(df)
    warnings: list[str] = []
    if "CartesianProduct" in plan:
        warnings.append("CartesianProduct: unconditional n×m join — add a join key or broadcast")
    # read the join type from each node's Arguments detail section (the
    # tree line alone never carries it). An INNER BroadcastNestedLoopJoin
    # is the designed broadcast-crossJoin shape (tiny side replicated,
    # e.g. a one-row total or a K×dim centroid table) — flag only the
    # outer/semi variants, where the stream side re-scans the broadcast
    # per row with no early-out.
    bnlj_args = _re.findall(
        r"\) BroadcastNestedLoopJoin\s*\nArguments: ([^\n]*)", plan
    )
    if any("Inner" not in a and "Cross" not in a for a in bnlj_args):
        warnings.append("BroadcastNestedLoopJoin: non-equi join replicated per row")
    if "Scan parquet" in plan and "PushedFilters: []" in plan and "Filter" in plan:
        warnings.append(
            "Filter present but no PushedFilters on a parquet scan — "
            "predicate not reaching storage (cast/UDF in the predicate?)"
        )
    # full-outer preserves both sides, so neither can broadcast — a
    # sort-merge FullOuter is the correct strategy, not a missed hint
    smj_args = _re.findall(r"\) SortMergeJoin\s*\nArguments: ([^\n]*)", plan)
    if (
        any("FullOuter" not in a for a in smj_args)
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
    n_agg_nodes = len(_re.findall(r"\(\d+\) HashAggregate", plan))
    n_exchanges = len(_re.findall(r"\(\d+\) Exchange", plan))
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
