"""S5 /DecodeParms predictor tests: PNG row filters (10-15) and TIFF
horizontal differencing (2) on FlateDecode streams — the predictor
forms real-world producers emit (ISO 32000 §7.4.4.4; filter math per
the public PNG specification)."""

from __future__ import annotations

import zlib

from ndl_core_data_pipeline_spark.functions import pdf as P
from ndl_core_data_pipeline_spark.functions import udfs


def _png_filter(data: bytes, columns: int, ftype: int, bpp: int = 1) -> bytes:
    """Forward-apply one PNG filter type to every row (test-side encoder)."""
    out = bytearray()
    prev = bytearray(columns)
    for r0 in range(0, len(data), columns):
        row = bytearray(data[r0 : r0 + columns])
        enc = bytearray(row)
        for j in range(len(row)):
            a = row[j - bpp] if j >= bpp else 0
            b = prev[j]
            c = prev[j - bpp] if j >= bpp else 0
            if ftype == 1:
                enc[j] = (row[j] - a) & 0xFF
            elif ftype == 2:
                enc[j] = (row[j] - b) & 0xFF
            elif ftype == 3:
                enc[j] = (row[j] - ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[j] = (row[j] - pred) & 0xFF
        out += bytes([ftype]) + enc
        prev = row
    return bytes(out)


def test_png_unfilter_roundtrip_all_types():
    data = bytes(range(256)) * 4  # 1024 bytes, 8 rows of 128
    for ftype in (0, 1, 2, 3, 4):
        filtered = _png_filter(data, 128, ftype)
        assert P._png_unfilter(filtered, 128, 1, 8) == data, f"type {ftype}"


def test_png_unfilter_multibyte_pixels():
    # 3-component 8-bit pixels: Sub/Paeth reference the byte bpp=3 back
    data = bytes((i * 7) & 0xFF for i in range(30 * 6))
    filtered = _png_filter(data, 30, 4, bpp=3)
    assert P._png_unfilter(filtered, 10, 3, 8) == data


def test_tiff_predictor_roundtrip():
    data = bytes((i * 13) & 0xFF for i in range(40))
    rowlen, colors = 10, 2
    enc = bytearray(data)
    for r0 in range(0, len(enc), rowlen):
        for j in range(r0 + rowlen - 1, r0 + colors - 1, -1):
            enc[j] = (enc[j] - enc[j - colors]) & 0xFF
    assert P._tiff_unpredict(bytes(enc), 5, colors, 8) == data


def _predictor_pdf(content: bytes, columns: int = 16) -> bytes:
    """Mini PDF whose content stream is Flate + PNG Up-predictor coded."""
    pad = (-len(content)) % columns
    padded = content + b" " * pad
    comp = zlib.compress(_png_filter(padded, columns, 2))
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode"
        b"/DecodeParms<</Predictor 12/Columns %d>>>>\nstream\n"
        % (len(comp), columns)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.5\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size 6/Root 1 0 R>>\n%%EOF"
    return bytes(out)


def test_predictor_coded_content_stream_extracts():
    content = b"BT /F1 12 Tf 72 720 Td (Predicted stream text) Tj ET"
    text = udfs.extract_pdf_text(_predictor_pdf(content), ocr_threshold=0)
    assert "Predicted stream text" in text


def test_predictor_1_is_identity():
    raw = b"BT (plain) Tj ET"
    comp = zlib.compress(raw)
    d = b"<</Length 99/Filter/FlateDecode/DecodeParms<</Predictor 1>>>>"
    assert P._inflate(d, comp) == raw
