"""S5 distributed PDF fan-out: binaryFile listing -> mapInPandas tiered
text extraction, with per-file fault isolation."""

from __future__ import annotations

from ndl_core_data_pipeline_spark.sources.pdfs import scan_pdfs

from .test_pdf import _mini_pdf
from .test_pdf_encryption import CONTENT as ENC_CONTENT, _encrypted_pdf


def test_scan_pdfs_extracts_and_isolates(spark, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "plain.pdf").write_bytes(_mini_pdf([b"hello spark", b"second line"]))
    (d / "crypt.pdf").write_bytes(_encrypted_pdf(ENC_CONTENT, r=3))
    (d / "broken.pdf").write_bytes(b"%PDF-1.4 truncated garbage with no xref")
    (d / "notes.txt").write_text("not a pdf")  # listing must skip

    rows = {r["path"].split("/")[-1]: r for r in scan_pdfs(spark, str(d)).collect()}
    assert set(rows) == {"plain.pdf", "crypt.pdf", "broken.pdf"}
    assert "hello spark" in rows["plain.pdf"]["text"]
    assert rows["plain.pdf"]["error"] is None
    assert rows["plain.pdf"]["n_chars"] == len(rows["plain.pdf"]["text"])
    # RC4-encrypted document decrypts in the distributed path too
    assert "Restricted document text" in rows["crypt.pdf"]["text"]
    # the broken file yields an empty-text row (the parser treats garbage
    # as zero extractable objects), never a failed scan
    assert rows["broken.pdf"]["text"] == ""
    assert rows["broken.pdf"]["n_bytes"] > 0
