"""S5 PDF extraction: pure-Python text layer + OCR threshold branch
(ref: resources/convertors/pdf_extractor.py:56-101, threshold :12;
assertion style of tests/resources/test_pdf_extractor_unittest.py:13-27)."""

from __future__ import annotations

import os
import zlib

import pytest

from ndl_core_data_pipeline_spark.functions import pdf as P
from ndl_core_data_pipeline_spark.functions import udfs

REF_PDF1 = "/root/reference/tests/test_data/9b0b17ab-4769-4d71-9783-05526794ab01.pdf"
REF_PDF2 = "/root/reference/tests/test_data/03520554-9b1a-4f68-89d0-6164b385b118.pdf"


def _mini_pdf(lines: list[bytes]) -> bytes:
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        + b" ".join(b"(" + ln + b") Tj 0 -14 Td" for ln in lines)
        + b" ET"
    )
    comp = zlib.compress(content)
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objects, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<</Size %d/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF" % (
        len(objects) + 1,
        xref_pos,
    )
    return bytes(out)


def test_mini_pdf_text_layer():
    payload = _mini_pdf(
        [b"Hello PDF world", b"Escaped \\(parens\\) kept", b"Pound \\243 sign"]
    )
    text = udfs.extract_pdf_text(payload, ocr_threshold=0)
    assert "Hello PDF world" in text
    assert "Escaped (parens) kept" in text
    assert "Pound \xa3 sign" in text  # octal escape \243 -> £
    # line structure survives the Td breaks
    assert text.index("Hello") < text.index("Escaped") < text.index("Pound")


def test_ocr_branch_appends_when_longer(monkeypatch):
    payload = _mini_pdf([b"tiny"])
    ocr_text = "OCR RECOVERED CONTENT " * 20
    monkeypatch.setattr(udfs, "_pdf_ocr", lambda _: ocr_text.strip())
    text = udfs.extract_pdf_text(payload)  # text layer < 200 chars
    assert text.startswith("tiny\n\n")
    assert "OCR RECOVERED CONTENT" in text
    # OCR consulted but NOT appended when the text layer is long enough
    long_payload = _mini_pdf([b"x" * 90, b"y" * 90, b"z" * 90])
    assert "OCR" not in udfs.extract_pdf_text(long_payload)


def test_ocr_unavailable_returns_text_layer():
    # container has no pdf2image/pytesseract: the short text stands
    payload = _mini_pdf([b"tiny"])
    assert udfs.extract_pdf_text(payload) == "tiny"


def test_tounicode_cmap_parse():
    cmap = P._parse_tounicode(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0041> <0058> <0042> <00660066> endbfchar\n"
        b"1 beginbfrange <0050> <0052> <0061> endbfrange\n"
    )
    assert cmap["_codelen"] == 2
    assert cmap[0x41] == "X"
    assert cmap[0x42] == "ff"  # multi-char target
    assert (cmap[0x50], cmap[0x51], cmap[0x52]) == ("a", "b", "c")
    assert P._decode_shown(b"\x00\x41\x00\x50", cmap) == "Xa"


def test_simple_font_one_byte_codelen():
    # writer quirk: codespacerange says 2 bytes, bfchar sources are 1 byte
    cmap = P._parse_tounicode(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <20> <0020> <41> <0041> endbfchar\n"
    )
    assert cmap["_codelen"] == 1
    assert P._decode_shown(b"A B", cmap) == "A B"  # unmapped ' ' falls back


def _pdf_from_objects(objects: list[bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size %d/Root 1 0 R>>\n%%%%EOF" % (len(objects) + 1)
    return bytes(out)


def test_indirect_length_ref_resolved():
    # '/Length 6 0 R' must not backtrack-match as a tiny direct length
    content = b"BT (indirect length works) Tj ET"
    comp = zlib.compress(content)
    payload = _pdf_from_objects(
        [
            b"<</Type/Catalog/Pages 2 0 R>>",
            b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
            b"<</Type/Page/Parent 2 0 R/Contents 4 0 R>>",
            b"<</Length 6 0 R/Filter/FlateDecode>>\nstream\n" + comp + b"\nendstream",
            b"<</Type/Font>>",
            b"%d" % len(comp),
        ]
    )
    assert "indirect length works" in P.pdf_text(payload)


def test_contents_array_without_space_and_indirect_array():
    # '/Contents[4 0 R]' (no whitespace — '[' is a delimiter) and
    # '/Contents 6 0 R' where object 6 is an array of stream refs
    c1, c2 = zlib.compress(b"BT (page one) Tj ET"), zlib.compress(b"BT (page two) Tj ET")
    payload = _pdf_from_objects(
        [
            b"<</Type/Catalog/Pages 2 0 R>>",
            b"<</Type/Pages/Kids[3 0 R 5 0 R]/Count 2>>",
            b"<</Type/Page/Parent 2 0 R/Contents[4 0 R]>>",
            b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(c1) + c1 + b"\nendstream",
            b"<</Type/Page/Parent 2 0 R/Contents 6 0 R>>",
            b"[7 0 R]",
            b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(c2) + c2 + b"\nendstream",
        ]
    )
    text = P.pdf_text(payload)
    assert "page one" in text and "page two" in text


def test_malformed_cmap_odd_hex_degrades():
    # odd digit count in the destination must degrade, not raise
    cmap = P._parse_tounicode(b"1 beginbfchar <0041> <058> endbfchar\n")
    assert isinstance(cmap[0x41], str)  # replacement char, no crash
    assert P._u16(b"0") == "" and P._u16(b"00410") == "A"


def test_false_obj_header_inside_stream_does_not_clobber():
    # stream bytes containing '5 0 obj' must not overwrite real object 5
    fake = b"junk 5 0 obj <</Type/Font/Bogus true>> endobj junk"
    content = zlib.compress(b"BT (real text) Tj ET")
    payload = _pdf_from_objects(
        [
            b"<</Type/Catalog/Pages 2 0 R>>",
            b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
            b"<</Type/Page/Parent 2 0 R/Contents 4 0 R>>",
            b"<</Length %d>>\nstream\n" % len(fake) + fake + b"\nendstream",
            b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(content)
            + content
            + b"\nendstream",
        ]
    )
    objs = P._objects(payload)
    assert b"Bogus" not in objs[5][0]
    assert objs[5][1] is not None  # real object 5's stream survived


@pytest.mark.skipif(not os.path.exists(REF_PDF1), reason="reference fixtures absent")
def test_reference_pdf1_text_layer():
    text = udfs.extract_pdf_text(open(REF_PDF1, "rb").read())
    assert "The National Minimum Wage (NMW) was introduced in 1999" in text


@pytest.mark.skipif(not os.path.exists(REF_PDF2), reason="reference fixtures absent")
def test_reference_pdf2_cid_text_layer():
    # scanned-heavy PDF: only the title page has a text layer; the rest
    # needs the OCR tier (absent here) — same tiering as the reference
    text = udfs.extract_pdf_text(open(REF_PDF2, "rb").read())
    assert "National Clinical Audit of Seizures" in text
