"""Property tests for the pure-Python spreadsheet cell tiers: random
cell grids serialized through minimal writers round-trip byte-exactly
(modulo each format's empty-trailing normalization)."""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from ndl_core_data_pipeline_spark.sources.ods import read_ods
from ndl_core_data_pipeline_spark.sources.xlsx import read_xlsx

# cell text: printable unicode incl. spaces/specials the XML layer must
# escape; no control chars (spreadsheet producers don't emit them raw)
_cell = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="￾￿"
    ),
    max_size=12,
)
_grid = st.lists(
    st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=8
)


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xlsx_bytes(grid: list[list[str]]) -> bytes:
    rows = []
    for r, row in enumerate(grid, 1):
        cells = "".join(
            f'<c r="{_col_ref(c)}{r}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(v)}</t></is></c>"
            for c, v in enumerate(row)
        )
        rows.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _ods_bytes(grid: list[list[str]]) -> bytes:
    rows = []
    for row in grid:
        cells = "".join(
            '<table:table-cell office:value-type="string">'
            f"<text:p>{escape(v)}</text:p></table:table-cell>"
            for v in row
        )
        rows.append(f"<table:table-row>{cells}</table:table-row>")
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet><table:table table:name="S">'
        f"{''.join(rows)}</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml", content)
    return buf.getvalue()


@settings(max_examples=60, deadline=None)
@given(_grid)
def test_xlsx_roundtrip(grid):
    sheets = read_xlsx(io.BytesIO(_xlsx_bytes(grid)))
    assert sheets == {"S": _expected(grid)}


def _expected(grid: list[list[str]]) -> list[list[str]]:
    """The shared tier normalization: per-row trailing empty cells and
    trailing all-empty rows collapse (pending/sparse design), then the
    kept rows rectangularize to the widest kept row."""
    trimmed = []
    for row in grid:
        last = max((i for i, v in enumerate(row) if v != ""), default=-1)
        trimmed.append(row[: last + 1])
    while trimmed and not trimmed[-1]:
        trimmed.pop()
    if not trimmed:
        return []
    width = max(len(r) for r in trimmed)
    return [r + [""] * (width - len(r)) for r in trimmed]


@settings(max_examples=60, deadline=None)
@given(_grid)
def test_ods_roundtrip(grid):
    sheets = read_ods(io.BytesIO(_ods_bytes(grid)))
    assert sheets == {"S": _expected(grid)}


@settings(max_examples=40, deadline=None)
@given(_grid)
def test_tiers_agree_on_same_grid(grid):
    # the same logical workbook must parse identically from either
    # container format (downstream type inference sees one shape)
    x = read_xlsx(io.BytesIO(_xlsx_bytes(grid)))
    o = read_ods(io.BytesIO(_ods_bytes(grid)))
    assert x == o
