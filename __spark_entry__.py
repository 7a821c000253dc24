"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 via ndl_core_data_pipeline_spark.contract — each query is a
(spark, sf_dir) -> DataFrame callable with (where SQL-expressible) a DuckDB
oracle whose column names match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ndl_core_data_pipeline_spark.contract import build_registry

_REGISTRY = None


def _registry():
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
    return _REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ndl_core_data_pipeline_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry().queries)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an entry get the
    weaker rows-only check (non-SQL-expressible ops)."""
    return dict(_registry().oracles)
