"""Per-record error quarantine — the engine's side-output for rows that
fail validation (SURVEY §4.1: the reference tolerates bad records with
per-file try/except + counters, assets/processing/assets.py:223-228; a
distributed engine routes them to an errors output instead of a log line).

One scan computes every check; the failed-check names travel with the row
so the quarantine output is self-describing. At scale, materialize the
validated frame once (persist / checkpoint) before splitting so the scan
isn't repeated per output — both halves then read the same computed plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ERRORS_COL = "_errors"


def validate(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Append an array column of failed check names (empty = valid row).
    `checks` maps check-name → boolean Column that is True when the row
    PASSES. Null check results count as failures (permissive predicates
    must say so explicitly)."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in checks.items()
            ]
        )
    )
    return df.withColumn(ERRORS_COL, failed)


def quarantine(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, errors): valid rows with the marker column
    dropped, error rows keeping `_errors` (the failed check names)."""
    v = validate(df, checks)
    valid = v.filter(F.size(ERRORS_COL) == 0).drop(ERRORS_COL)
    errors = v.filter(F.size(ERRORS_COL) > 0)
    return valid, errors


def error_stats(errors: DataFrame) -> DataFrame:
    """Counts per failed check (a row failing N checks counts N times) —
    the engine-side form of the reference's per-format reject counters
    (assets/processing/assets.py:168-171)."""
    return (
        errors.select(F.explode(ERRORS_COL).alias("check"))
        .groupBy("check")
        .count()
        .orderBy(F.desc("count"), "check")
    )


__all__ = ["ERRORS_COL", "error_stats", "quarantine", "validate"]
