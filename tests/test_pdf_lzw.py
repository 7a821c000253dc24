"""LZWDecode tests: a test-side encoder (mirroring the decoder's
EarlyChange width bookkeeping) round-trips arbitrary bytes, and an
LZW-filtered mini PDF extracts its text layer."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ndl_core_data_pipeline_spark.functions import pdf as P
from ndl_core_data_pipeline_spark.functions import udfs


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(self.buf)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    w = _BitWriter()
    width = 9
    w.write(256, width)  # clear
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    seq = b""
    for ch in data:
        cand = seq + bytes([ch])
        if cand in table:
            seq = cand
            continue
        w.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # the decoder's table is one entry behind next_code; mirror its
        # (size + early >= 1<<width) bump so widths stay in lockstep
        if (next_code - 1) + early >= (1 << width) and width < 12:
            width += 1
        seq = bytes([ch])
    if seq:
        w.write(table[seq], width)
        next_code += 1
        if (next_code - 1) + early >= (1 << width) and width < 12:
            width += 1
    w.write(257, width)  # EOD
    return w.done()


def test_known_sequence_roundtrip():
    data = b"TOBEORNOTTOBEORTOBEORNOT" * 3
    assert P._lzw_decode(_lzw_encode(data)) == data


def test_table_growth_past_width_bumps():
    # > 254 distinct new sequences forces 9->10 bit codes (and more)
    data = bytes(range(256)) * 8
    assert P._lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_random(data):
    assert P._lzw_decode(_lzw_encode(data)) == data


def test_corrupt_stream_returns_none():
    # a code far beyond the table with no prior data is invalid
    w = _BitWriter()
    w.write(300, 9)
    assert P._lzw_decode(w.done()) is None


def _lzw_pdf(content: bytes) -> bytes:
    comp = _lzw_encode(content)
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/LZWDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.2\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size 6/Root 1 0 R>>\n%%EOF"
    return bytes(out)


def test_lzw_pdf_text_layer():
    content = b"BT /F1 12 Tf 72 720 Td (Legacy LZW text) Tj ET"
    text = udfs.extract_pdf_text(_lzw_pdf(content), ocr_threshold=0)
    assert "Legacy LZW text" in text
