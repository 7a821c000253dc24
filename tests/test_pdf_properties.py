"""Property-based tests for the pure-Python PDF text layer: the literal
string codec and the object scanner must survive arbitrary byte content
(a 100 TB crawl WILL contain every pathological encoding)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ndl_core_data_pipeline_spark.functions import pdf as P


def encode_literal(raw: bytes) -> bytes:
    """Spec-conformant PDF literal string encoder (§7.3.4.2): escape the
    delimiters and backslash; octal-escape bytes that would otherwise be
    line terminators (so the decoder's EOL normalization can't bite)."""
    out = bytearray(b"(")
    for byte in raw:
        if byte in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([byte])
        elif byte in (0x0A, 0x0D):
            out += ("\\%03o" % byte).encode()
        else:
            out.append(byte)
    out.append(0x29)
    return bytes(out)


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_literal_string_roundtrip(raw):
    encoded = encode_literal(raw)
    decoded, end = P._scan_literal(encoded, 0)
    assert decoded == raw
    assert end == len(encoded)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_scan_literal_never_crashes_on_garbage(data):
    # arbitrary bytes after an opening paren: must terminate and return
    # bytes, never raise
    out, end = P._scan_literal(b"(" + data, 0)
    assert isinstance(out, bytes)
    assert 0 < end <= len(data) + 1


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_planted_text_survives_arbitrary_sibling_stream(noise):
    # a stream of arbitrary bytes (may contain 'N 0 obj', 'endstream',
    # 'endobj'...) must neither crash the scanner nor clobber the real
    # content object, because its extent is consumed via /Length
    content = zlib.compress(b"BT (sentinel payload) Tj ET")
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Contents 4 0 R>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(content)
        + content
        + b"\nendstream",
        b"<</Length %d>>\nstream\n" % len(noise) + noise + b"\nendstream",
    ]
    payload = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objects, 1):
        payload += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    payload += b"%%EOF"
    text = P.pdf_text(bytes(payload))
    assert "sentinel payload" in text


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            min_size=1,
            max_size=40,
        ).map(lambda s: s.replace("\\", " ").replace("(", " ").replace(")", " ")),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_mini_pdf_preserves_line_text(lines):
    from tests.test_pdf import _mini_pdf
    from ndl_core_data_pipeline_spark.functions import udfs

    payload = _mini_pdf([ln.encode("latin-1") for ln in lines])
    text = udfs.extract_pdf_text(payload, ocr_threshold=0)
    for ln in lines:
        if ln.strip():
            assert ln.strip() in text
