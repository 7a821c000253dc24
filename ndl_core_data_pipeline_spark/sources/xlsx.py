"""Pure-Python XLSX cell extraction (SURVEY §2.1 S4 tier 1).

The reference reads workbooks with ``pd.read_excel(..., dtype=str,
keep_default_na=False)`` (resources/convertors/spreadsheet_to_parquet.py:
131-139) — every cell as a string, one table per sheet. openpyxl is not
in this container, but XLSX is just a zip of SpreadsheetML XML
(ECMA-376 / ISO 29500, a public spec), so this module parses the three
parts that matter with stdlib ``zipfile`` + ``xml.etree``:

- ``xl/workbook.xml``       sheet names in workbook order + rel ids
- ``xl/_rels/workbook.xml.rels``  rel id -> worksheet part path
- ``xl/sharedStrings.xml``  the shared-string table (``t="s"`` cells)
- ``xl/worksheets/sheetN.xml``  rows/cells; refs like ``BC12`` place
  sparse cells, gaps become ""

Cell-value mapping (all to str, mirroring the reference's dtype=str):
shared / inline / formula-cached strings verbatim; numbers as the raw
stored lexical form; booleans as "True"/"False" (what pandas' str cast
yields). Deviation: date-styled numeric cells stay as raw Excel serial
numbers — mapping them to datetimes needs styles.xml numFmt heuristics
the reference delegates to pandas; documented, not hidden.

This runs per-file inside the S4 mapInPandas fan-out: one task per
workbook, parallelism across MANY files (workbooks themselves are
small and not splittable).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26, 'BC' -> 54 (base-26, 1-anchored)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _string_item_text(el: ET.Element) -> str:
    """Concatenate the display <t> runs of an <si>/<is> item: plain <t>
    or rich-text <r><t> runs. Phonetic guide runs (<rPh>, emitted by
    Japanese-locale Excel) and <phoneticPr> are NOT display text and are
    skipped — flattening them would corrupt the cell value."""
    parts: list[str] = []
    for child in el:
        tag = child.tag
        if tag in (f"{_NS}rPh", f"{_NS}phoneticPr"):
            continue
        if tag == f"{_NS}t":
            parts.append(child.text or "")
        else:  # <r> run (or future wrapper): recurse
            parts.append(_string_item_text(child))
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_string_item_text(si) for si in root.iter(f"{_NS}si")]


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip member path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels.iter(f"{_REL_NS}Relationship")
    }
    out: list[tuple[str, str]] = []
    for sheet in wb.iter(f"{_NS}sheet"):
        rid = sheet.get(f"{_DOC_REL}id")
        target = target_by_id.get(rid, "")
        if not target:
            continue
        # targets are workbook-relative ("worksheets/sheet1.xml") or
        # package-absolute ("/xl/worksheets/sheet1.xml")
        member = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
        out.append((sheet.get("name") or "sheet", member))
    return out


def _cell_value(cell: ET.Element, shared: list[str]) -> str:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return ""
        return _string_item_text(is_el)
    v = cell.find(f"{_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if raw == "":
        return ""
    if ctype == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if ctype == "b":
        return "True" if raw.strip() == "1" else "False"
    # "n" (number), "str" (cached formula string), "e" (error literal)
    return raw


def _sheet_rows(zf: zipfile.ZipFile, member: str, shared: list[str]) -> list[list[str]]:
    """Rectangular rows of string cells, with the same empty-trailing
    normalization as the ODS tier: per-row trailing empty cells and
    trailing all-empty rows collapse, interior gaps blank-fill. Rows and
    cells accumulate SPARSELY keyed on the r= attributes — a formatting
    ghost cell at A1048576 (a common Excel artifact) must not
    materialize a million empty rows inside an executor task."""
    root = ET.fromstring(zf.read(member))
    data = root.find(f"{_NS}sheetData")
    if data is None:
        return []
    sparse: dict[int, list[str]] = {}
    next_row = 0
    for row_el in data.iter(f"{_NS}row"):
        r_attr = row_el.get("r")
        row_idx = int(r_attr) - 1 if r_attr else next_row
        next_row = row_idx + 1
        cells: list[str] = []
        next_col = 0
        for cell in row_el.iter(f"{_NS}c"):
            ref = cell.get("r")
            m = _CELL_REF.match(ref) if ref else None
            col = _col_index(m.group(1)) if m else next_col
            next_col = col + 1
            value = _cell_value(cell, shared)
            if value == "":
                continue
            if col < len(cells):  # out-of-order ref: place, don't append
                cells[col] = value
            else:
                cells.extend([""] * (col - len(cells)))
                cells.append(value)
        if cells:
            sparse[row_idx] = cells
    if not sparse:
        return []
    width = max(len(r) for r in sparse.values())
    last = max(sparse)
    return [
        sparse.get(i, []) + [""] * (width - len(sparse.get(i, ())))
        for i in range(last + 1)
    ]


def read_xlsx(src) -> dict[str, list[list[str]]]:
    """{sanitized-unique sheet name -> rectangular rows of string cells},
    sheets in workbook order — the contract read_workbook_sheets exposes
    and sheets_to_frames consumes. `src` is a path or a binary file-like
    (executors pass BytesIO over binaryFile content)."""
    from .spreadsheet import unique_sheet_name

    out: dict[str, list[list[str]]] = {}
    with zipfile.ZipFile(src) as zf:
        shared = _shared_strings(zf)
        for name, member in _sheet_parts(zf):
            out[unique_sheet_name(name, out)] = _sheet_rows(zf, member, shared)
    return out
