"""Pure-Python ODS cell extraction (SURVEY §2.1 S4 tier 1, ODS half).

ODS is a zip with the sheet data in ``content.xml`` (OASIS OpenDocument
v1.2, a public spec) — parsed here with stdlib ``zipfile`` +
``xml.etree``, replacing the previous odfpy gate:

- ``table:table`` per sheet (document order), ``table:table-row`` /
  ``table:table-cell`` with ``table:number-columns-repeated`` /
  ``table:number-rows-repeated`` run-length encoding. Producers emit
  huge trailing empty runs (e.g. 16378 repeated empty cells to pad to
  the full grid), so empty repeats are held as pending counts and only
  materialize when non-empty content follows — trailing padding never
  allocates.
- cell values to strings: float/currency/percentage cells read the
  canonical ``office:value`` attribute, date/time cells their
  ``office:*-value``, booleans "True"/"False", strings the display
  text (``text:p`` paragraphs joined with newlines; ``text:s``
  expands to spaces, ``text:tab``/``text:line-break`` to the obvious
  characters, nested spans recursed). Deviation from the reference's
  pandas path (which str()s typed cells, e.g. currency -> "263246.0"):
  numeric cells keep the canonical lexical form ("263246") — same
  policy as the XLSX tier.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

_T = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_X = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _para_text(el: ET.Element) -> str:
    out = [el.text or ""]
    for child in el:
        tag = child.tag
        if tag == f"{_X}s":
            out.append(" " * int(child.get(f"{_X}c", "1")))
        elif tag == f"{_X}tab":
            out.append("\t")
        elif tag == f"{_X}line-break":
            out.append("\n")
        else:
            out.append(_para_text(child))
        out.append(child.tail or "")
    return "".join(out)


def _cell_value(cell: ET.Element) -> str:
    vtype = cell.get(f"{_O}value-type", "")
    if vtype in ("float", "currency", "percentage"):
        return cell.get(f"{_O}value", "")
    if vtype == "date":
        return cell.get(f"{_O}date-value", "")
    if vtype == "time":
        return cell.get(f"{_O}time-value", "")
    if vtype == "boolean":
        b = cell.get(f"{_O}boolean-value")
        if b is None:  # malformed producer cell: fall back to display text
            return "\n".join(_para_text(p) for p in cell.findall(f"{_X}p"))
        return "True" if b == "true" else "False"
    return "\n".join(_para_text(p) for p in cell.findall(f"{_X}p"))


def _table_rows(table: ET.Element) -> list[list[str]]:
    rows: list[list[str]] = []
    pending_empty_rows = 0
    for row_el in table.iter(f"{_T}table-row"):
        cells: list[str] = []
        pending_empty_cells = 0
        for cell in row_el:
            if cell.tag not in (f"{_T}table-cell", f"{_T}covered-table-cell"):
                continue
            repeat = int(cell.get(f"{_T}number-columns-repeated", "1"))
            value = (
                "" if cell.tag == f"{_T}covered-table-cell" else _cell_value(cell)
            )
            if value == "":
                pending_empty_cells += repeat
                continue
            cells.extend([""] * pending_empty_cells)
            pending_empty_cells = 0
            cells.extend([value] * repeat)
        repeat = int(row_el.get(f"{_T}number-rows-repeated", "1"))
        if not cells:
            pending_empty_rows += repeat
            continue
        rows.extend([[]] * pending_empty_rows)
        pending_empty_rows = 0
        rows.extend([list(cells) for _ in range(repeat)])
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def read_ods(src) -> dict[str, list[list[str]]]:
    """{sanitized-unique sheet name -> rectangular rows of string cells},
    sheets in document order — same contract as xlsx.read_xlsx. `src` is
    a path or a binary file-like."""
    from .spreadsheet import unique_sheet_name

    with zipfile.ZipFile(src) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    out: dict[str, list[list[str]]] = {}
    for table in root.iter(f"{_T}table"):
        name = table.get(f"{_T}name") or "sheet"
        out[unique_sheet_name(name, out)] = _table_rows(table)
    return out
