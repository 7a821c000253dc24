"""Fixed-width text ingestion (engine surface beyond the reference's
CSV/JSON/XLSX scans — the format legacy government extracts ship in).

The whole parse is DECLARATIVE: one `spark.read.text` line scan plus one
`F.substring` per column, so slicing runs inside whole-stage codegen and
the scan parallelizes by line like any text source — no Python in the
hot path. Column values trim trailing pad and flow into the same
two-phase type inference (`ingest.infer.infer_and_cast`) the CSV reader
uses, so fixed-width files get identical typing semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ingest.infer import infer_and_cast


@dataclass(frozen=True)
class FwColumn:
    """One field of a fixed-width layout: 1-based start, width."""

    name: str
    start: int
    width: int


def parse_fixed_width(
    lines: DataFrame,
    layout: list[FwColumn],
    value_col: str = "value",
    pad: str = " ",
) -> DataFrame:
    """Slice a line column into the layout's fields (all strings,
    pad-trimmed; short lines yield empty strings for out-of-range
    fields, matching the lenient posture of the CSV reader)."""
    if not layout:
        raise ValueError("fixed-width layout must name at least one column")
    seen = set()
    for c in layout:
        if c.name in seen:
            raise ValueError(f"duplicate layout column {c.name!r}")
        seen.add(c.name)
        if c.start < 1 or c.width < 1:
            raise ValueError(f"column {c.name!r}: start/width must be >= 1")
    # non-default pads build a Java regex char class: escape the pad so
    # regex-special characters ('^', ']', '\\') cannot corrupt the class
    esc = "".join(
        ch if ch.isalnum() else "\\" + ch for ch in pad
    )
    cols = [
        F.rtrim(
            F.ltrim(F.substring(F.col(value_col), c.start, c.width))
        ).alias(c.name)
        if pad == " "
        else F.regexp_replace(
            F.substring(F.col(value_col), c.start, c.width),
            f"^[{esc}]+|[{esc}]+$",
            "",
        ).alias(c.name)
        for c in layout
    ]
    return lines.select(*cols)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: list[FwColumn],
    header_lines: int = 0,
    infer: bool = True,
) -> DataFrame:
    """Fixed-width file(s) → typed DataFrame. `header_lines` leading
    lines are dropped PER FILE: rows rank by monotonically_increasing_id
    within input_file_name(), so a directory/glob input drops every
    file's header, not just the first-scheduled file's (a bare global
    id filter gets that wrong — partition 0 is the only partition whose
    ids start at 0). Line order within a file holds because splits of
    one file enter the scan in offset order for equal-size splits
    (stable sort) and headers live in the first split."""
    lines = spark.read.text(path)
    if header_lines:
        from pyspark.sql import Window as W

        w = W.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        lines = (
            lines.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > header_lines)
            .drop("_rn")
        )
    raw = parse_fixed_width(lines, layout)
    return infer_and_cast(raw) if infer else raw
