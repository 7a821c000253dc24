"""Skew-mitigation helpers — the 100 TB posture for hot keys.

AQE's skew-join handling covers sort-merge joins at runtime; these
helpers cover the two cases AQE doesn't: aggregations over power-law
keys, and broadcast-ineligible joins where one side's hot keys would
pin single reducers.

- salted_agg: two-phase aggregation — groupBy(key, salt) partial →
  groupBy(key) final. Works for any algebraic aggregate expressed as
  (partial_exprs, final_exprs) pairs; count/sum come built in.
- salted_join: replicate the small side R times, salt the big side —
  every hot key spreads over R reducers. Use when the small side is too
  big to broadcast but small enough to replicate R×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS, col_name: str = "_salt") -> DataFrame:
    """Uniform salt from monotonically_increasing_id() % n_salts — a
    random-free, row-stable expression (the id already encodes the
    partition in its high bits), deterministic within a run without a
    Python RNG."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_count(df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """count(*) by key, immune to hot keys: partial count per (key, salt),
    final sum per key. Same result as df.groupBy(key).count()."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_sum(
    df: DataFrame, key: str, value: Column, alias: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Order-independent decimal sum by key with salting (see
    operators/_util.py for the decimal rationale)."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.sum(value.cast("decimal(25,6)")).alias("_s"))
    )
    return partial.groupBy(key).agg(F.sum("_s").cast("double").alias(alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts×, so a hot key occupies n_salts reducers instead of one.

    Only join types where the replicated side never emits unmatched rows
    are valid: a right/full outer join would surface each unmatched
    small-side row n_salts times."""
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the small side is replicated, so outer-preserving it duplicates rows"
        )
    big_salted = with_salt(big, n_salts)
    salts = small.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_rep = small.crossJoin(salts)
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")
