"""Small shared expression helpers importable without circularity."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum_expr(col: Column, alias: str) -> Column:
    """Order-independent double sum (see operators/_util.py rationale)."""
    return F.sum(col.cast("decimal(25,6)")).cast("double").alias(alias)
