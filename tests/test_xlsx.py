"""S4 pure-Python XLSX cell-extraction tests (sources/xlsx.py).

Fixture workbooks are assembled with stdlib zipfile from hand-written
SpreadsheetML (the format is zip+XML per ECMA-376), covering shared
strings (plain + rich-text runs), inline strings, numbers, booleans,
cached formula results, sparse cells/rows, and multi-letter column
refs. A second test, gated on the path existing, reads the reference
repo's real Excel-produced workbooks to confirm the parser handles
genuine producer output (semantics mirror the reference's
tests/resources/test_spreadsheet_to_parquet.py:35-78: per-sheet
layout, sanitized names, all-string cells).
"""

from __future__ import annotations

import os
import zipfile

import pytest

from ndl_core_data_pipeline_spark.sources.spreadsheet import (
    read_workbook_sheets,
    sheets_to_frames,
)
from ndl_core_data_pipeline_spark.sources.xlsx import read_xlsx

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Water Level Readings" sheetId="1" r:id="rId1"/>
<sheet name="Notes/Misc" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="/xl/worksheets/sheet2.xml"/>
</Relationships>"""

# index 0 plain, index 1 rich-text runs, index 2-4 headers
_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
<si><t>Thames</t></si>
<si><r><t>Sev</t></r><r><t xml:space="preserve">ern</t></r></si>
<si><t>Station</t></si>
<si><t>Level</t></si>
<si><t>Open</t></si>
</sst>"""

# row 1 headers; row 2: shared str, number, bool; row 3 SKIPPED entirely;
# row 4: rich-text shared str, cached formula number in sparse col C and
# a far cell at AA4 (col 26)
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>2</v></c><c r="B1" t="s"><v>3</v></c><c r="C1" t="s"><v>4</v></c></row>
<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2"><v>3.25</v></c><c r="C2" t="b"><v>1</v></c></row>
<row r="4"><c r="A4" t="s"><v>1</v></c><c r="C4" t="b"><v>0</v></c><c r="AA4"><f>SUM(B2)</f><v>3.25</v></c></row>
</sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>note</t></is></c><c r="B1"><v>7</v></c></row>
</sheetData>
</worksheet>"""


@pytest.fixture(scope="module")
def workbook_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("xlsx") / "fixture.xlsx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(path)


def test_read_xlsx_cells(workbook_path):
    sheets = read_xlsx(workbook_path)
    # workbook order preserved, names sanitized ('/' -> '_')
    assert list(sheets) == ["Water_Level_Readings", "Notes_Misc"]
    rows = sheets["Water_Level_Readings"]
    assert rows[0][:3] == ["Station", "Level", "Open"]
    assert rows[1][:3] == ["Thames", "3.25", "True"]
    assert rows[2] == [""] * 27  # skipped row materializes as blanks
    # rich-text shared string concatenates runs; sparse cols gap-fill;
    # formula cell yields its cached value at AA (index 26)
    assert rows[3][0] == "Severn"
    assert rows[3][1] == ""
    assert rows[3][2] == "False"
    assert rows[3][26] == "3.25"
    # rectangular: every row padded to the widest (AA4 -> 27 cols)
    assert {len(r) for r in rows} == {27}
    assert sheets["Notes_Misc"] == [["note", "7"]]


def test_read_workbook_sheets_routes_xlsx(workbook_path):
    assert read_workbook_sheets(workbook_path) == read_xlsx(workbook_path)


def test_phonetic_runs_skipped():
    # Japanese-locale Excel emits <rPh> furigana runs inside <si>; they
    # are guide text, not cell value
    import io as _io
    from xml.etree import ElementTree as ET

    from ndl_core_data_pipeline_spark.sources.xlsx import _string_item_text

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    si = ET.fromstring(
        f'<si xmlns="{ns}"><t>東京</t>'
        f'<rPh sb="0" eb="2"><t>トウキョウ</t></rPh>'
        f'<phoneticPr fontId="1"/></si>'
    )
    assert _string_item_text(si) == "東京"
    rich = ET.fromstring(
        f'<si xmlns="{ns}"><r><t>Sev</t></r><r><t>ern</t></r>'
        f'<rPh sb="0" eb="6"><t>x</t></rPh></si>'
    )
    assert _string_item_text(rich) == "Severn"


def test_ghost_cell_does_not_materialize_rows():
    # a formatting-only cell parked at A1048576 (common Excel artifact)
    # must not allocate a million rows
    import io as _io

    sheet = (
        '<?xml version="1.0"?><worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c></row>'
        '<row r="1048576"><c r="A1048576" s="1"/></row></sheetData></worksheet>'
    )
    wb = _WORKBOOK.replace('<sheet name="Notes/Misc" sheetId="2" r:id="rId2"/>', "")
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert read_xlsx(_io.BytesIO(buf.getvalue())) == {
        "Water_Level_Readings": [["x"]]
    }


def test_xlsx_to_frames(spark, workbook_path):
    frames = sheets_to_frames(spark, read_xlsx(workbook_path))
    df = frames["Water_Level_Readings"]
    assert "Station" in df.columns and "Level" in df.columns
    assert df.count() == 3


_REF_DATA = "/root/reference/tests/test_data"


@pytest.mark.skipif(
    not os.path.isdir(_REF_DATA), reason="reference fixtures not present"
)
def test_real_excel_produced_workbooks():
    # multiple_sheets.xlsx: 3 sheets incl. 'Water Level Readings' with a
    # 'Time' column (reference test_spreadsheet_to_parquet.py:35-78)
    sheets = read_xlsx(os.path.join(_REF_DATA, "multiple_sheets.xlsx"))
    assert len(sheets) == 3
    assert "Water_Level_Readings" in sheets
    water = sheets["Water_Level_Readings"]
    assert "Time" in water[0]
    assert len(water) > 1 and all(isinstance(c, str) for c in water[1])

    single = read_xlsx(os.path.join(_REF_DATA, "single_sheet.xlsx"))
    assert len(single) == 1
    (rows,) = single.values()
    assert len(rows) >= 2 and len(rows[0]) >= 1

    complex_wb = read_xlsx(
        os.path.join(_REF_DATA, "multiple_sheets_complex.xlsx")
    )
    assert len(complex_wb) >= 2
