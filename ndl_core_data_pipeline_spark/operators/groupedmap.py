"""Grouped-map operators (SURVEY §2.13 grouped-map row):
groupBy().applyInPandas — one pandas frame per group, for semantics that
need the whole group in memory (per-document reassembly, per-group
normalization). The reference's analogs run as python loops per file/doc
(e.g. per-document chunk work, rag_search.py:50-65).

Keep groups bounded: the partition key must be high-cardinality and no
single group may exceed executor memory — the same constraint the
reference's per-file loops have per-process.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ..io import load


def zscore_per_group(spark, sf_dir):
    """Per-source z-score of document length via applyInPandas. The SQL
    oracle is the window form — the grouped-map result must match the
    declarative computation exactly (ddof=0 population std, 0 when the
    group is constant)."""
    docs = load(spark, sf_dir, "documents")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        std = float(x.std(ddof=0))
        mean = float(x.mean())
        z = (x - mean) / std if std > 0 else x * 0.0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_chars": pdf["n_chars"],
                "zscore": z.round(6),
            }
        )

    return docs.select("doc_id", "source", "n_chars").groupBy("source").applyInPandas(
        normalize, "doc_id BIGINT, source STRING, n_chars BIGINT, zscore DOUBLE"
    )


def register(reg):
    reg.add(
        "groupedmap_zscore",
        zscore_per_group,
        "SELECT doc_id, source, n_chars, "
        "ROUND(CASE WHEN stddev_pop(n_chars) OVER w > 0 "
        "THEN (n_chars - AVG(n_chars) OVER w) / (stddev_pop(n_chars) OVER w) "
        "ELSE 0.0 END, 6) AS zscore "
        "FROM documents WINDOW w AS (PARTITION BY source)",
    )
