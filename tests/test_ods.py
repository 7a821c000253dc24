"""S4 pure-Python ODS cell-extraction tests (sources/ods.py).

Fixture built with stdlib zipfile from hand-written OpenDocument XML
(OASIS ODF v1.2), covering typed cells (float/currency/date/boolean/
string), text:s space runs and spans, column/row repeat run-lengths,
and the huge trailing-empty padding runs real producers emit. A gated
test reads the reference repo's real .ods fixture."""

from __future__ import annotations

import os
import zipfile

import pytest

from ndl_core_data_pipeline_spark.sources.ods import read_ods
from ndl_core_data_pipeline_spark.sources.spreadsheet import read_workbook_sheets

_CONTENT = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
<office:body><office:spreadsheet>
<table:table table:name="Awards 2017/18">
<table:table-column table:number-columns-repeated="16384"/>
<table:table-row>
<table:table-cell office:value-type="string"><text:p>Lead<text:s/></text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p><text:span>Ti</text:span>tle</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>Award</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>Date</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>Live</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="16379"/>
</table:table-row>
<table:table-row>
<table:table-cell office:value-type="string"><text:p>MPS</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="1" office:value-type="string"><text:p>Contact</text:p></table:table-cell>
<table:table-cell office:value-type="currency" office:value="263246"><text:p>£263,246</text:p></table:table-cell>
<table:table-cell office:value-type="date" office:date-value="2017-11-02"><text:p>02/11/17</text:p></table:table-cell>
<table:table-cell office:value-type="boolean" office:boolean-value="true"><text:p>TRUE</text:p></table:table-cell>
</table:table-row>
<table:table-row table:number-rows-repeated="2">
<table:table-cell office:value-type="string"><text:p>dup</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="2"/>
<table:table-cell office:value-type="float" office:value="1.5"><text:p>1.5</text:p></table:table-cell>
</table:table-row>
<table:table-row table:number-rows-repeated="1048570"/>
</table:table>
<table:table table:name="Notes"><table:table-row>
<table:table-cell office:value-type="string"><text:p>a</text:p><text:p>b</text:p></table:table-cell>
</table:table-row></table:table>
</office:spreadsheet></office:body></office:document-content>"""


@pytest.fixture(scope="module")
def ods_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("ods") / "fixture.ods"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", _CONTENT)
    return str(path)


def test_read_ods_cells(ods_path):
    sheets = read_ods(ods_path)
    assert list(sheets) == ["Awards_2017_18", "Notes"]
    rows = sheets["Awards_2017_18"]
    # trailing 16379-col padding and the 1M-row tail never materialize
    assert len(rows) == 4 and {len(r) for r in rows} == {5}
    assert rows[0] == ["Lead ", "Title", "Award", "Date", "Live"]
    # typed cells: canonical office:value forms, not display text
    assert rows[1] == ["MPS", "Contact", "263246", "2017-11-02", "True"]
    # row repeat duplicates; interior empty-cell run gap-fills
    assert rows[2] == rows[3] == ["dup", "", "", "1.5", ""]
    # multiple text:p paragraphs join with newline
    assert sheets["Notes"] == [["a\nb"]]


def test_read_workbook_sheets_routes_ods(ods_path):
    assert read_workbook_sheets(ods_path) == read_ods(ods_path)


_REF_ODS = "/root/reference/tests/test_data/1d23678b-a09d-4e75-9093-3eea98a44ee5.ods"


@pytest.mark.skipif(not os.path.isfile(_REF_ODS), reason="reference fixture absent")
def test_real_producer_ods():
    sheets = read_ods(_REF_ODS)
    assert len(sheets) == 1
    (rows,) = sheets.values()
    # header row (reference fixture: Police Transformation Fund awards)
    assert any("Lead" in c for c in rows[1])
    flat = [c for r in rows for c in r]
    assert "MPS" in flat
    # currency cells surface the canonical numeric value
    assert "263246" in flat
    # no row carries the 16k-wide trailing padding
    assert max(len(r) for r in rows) < 50
