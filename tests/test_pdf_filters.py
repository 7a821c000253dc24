"""ASCIIHex / ASCII85 / RunLength filter tests + filter-chain handling
(ISO 32000 §7.4.2/7.4.3/7.4.5; chains like [/ASCII85Decode
/FlateDecode] are transport encodings around compressed streams)."""

from __future__ import annotations

import base64
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ndl_core_data_pipeline_spark.functions import pdf as P
from ndl_core_data_pipeline_spark.functions import udfs


def test_asciihex_basics():
    assert P._asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert P._asciihex_decode(b"48656c6c6f>") == b"Hello"
    # odd final digit pads with zero: trailing '6' -> 0x60
    assert P._asciihex_decode(b"486 >") == b"H\x60"
    assert P._asciihex_decode(b"zz>") is None


def test_ascii85_against_stdlib():
    for payload in (b"", b"a", b"ab", b"abc", b"abcd", b"Hello World!", b"\x00" * 9):
        enc = base64.a85encode(payload) + b"~>"
        assert P._ascii85_decode(enc) == payload
    # 'z' shorthand for a zero group
    assert P._ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    # 'z' inside a group is illegal; single trailing digit is illegal
    assert P._ascii85_decode(b"!z~>") is None
    assert P._ascii85_decode(b"!~>") is None


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600))
def test_ascii85_roundtrip_random(payload):
    assert P._ascii85_decode(base64.a85encode(payload) + b"~>") == payload


def test_runlength():
    # literal run: n=2 -> 3 bytes; repeat run: 257-254=3 copies; 128=EOD
    enc = bytes([2]) + b"abc" + bytes([254]) + b"x" + bytes([128]) + b"IGNORED"
    assert P._runlength_decode(enc) == b"abcxxx"


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=400))
def test_runlength_roundtrip_random(payload):
    # simple literal-only encoder (chunks of <=128)
    enc = bytearray()
    for i in range(0, len(payload), 128):
        chunk = payload[i : i + 128]
        enc += bytes([len(chunk) - 1]) + chunk
    enc += bytes([128])
    assert P._runlength_decode(bytes(enc)) == payload


def _chained_pdf(content: bytes) -> bytes:
    import base64 as b64

    comp = b64.a85encode(zlib.compress(content)) + b"~>"
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter[/ASCII85Decode /FlateDecode]>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size 6/Root 1 0 R>>\n%%EOF"
    return bytes(out)


def test_filter_chain_pdf_text_layer():
    content = b"BT /F1 12 Tf 72 720 Td (Chained filter text) Tj ET"
    text = udfs.extract_pdf_text(_chained_pdf(content), ocr_threshold=0)
    assert "Chained filter text" in text


def test_unknown_filter_still_routes_to_none():
    assert P._inflate(b"<</Filter/DCTDecode>>", b"\xff\xd8\xff") is None
    assert P._inflate(b"<</Filter[/FlateDecode /DCTDecode]>>", b"x") is None


def test_inline_image_binary_skipped():
    from ndl_core_data_pipeline_spark.functions.pdf import _content_text

    # the inline image's sample bytes contain fake text tokens that a
    # naive scan would emit
    content = (
        b"BT /F1 12 Tf (before) Tj ET "
        b"BI /W 2 /H 2 /CS /RGB /BPC 8 ID "
        b"\x00BT (fake) Tj\xff\x01 EI "
        b"BT (after) Tj ET"
    )
    text = _content_text(content, {})
    assert "before" in text and "after" in text
    assert "fake" not in text
