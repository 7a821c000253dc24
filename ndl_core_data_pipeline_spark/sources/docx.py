"""DOCX text extraction (engine surface — the word-processing sibling of
the XLSX/ODS cell tiers; a staple source for training-data pipelines).

Pure-stdlib WordprocessingML reader per the public ECMA-376 spec: a
.docx is a zip whose `word/document.xml` carries paragraphs (`w:p`) of
runs (`w:r`) of text nodes (`w:t`), with explicit tabs (`w:tab`) and
line breaks (`w:br`); `w:p` boundaries become newlines, matching the
paragraph-break posture of the HTML extractor. No python-docx needed.

Distributed shape identical to scan_pdfs: binaryFile lists the files
(listing-level glob pruning), mapInPandas fans out one task per
document, corrupt files yield error rows instead of failed scans.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

DOCX_TEXT_SCHEMA = (
    "path string, n_bytes bigint, n_paragraphs bigint, n_chars bigint, "
    "text string, error string"
)


def extract_docx_text(data) -> str:
    """WordprocessingML → plain text: paragraphs joined by newlines,
    runs concatenated in document order, tabs/breaks made explicit.
    Accepts bytes or a file-like object."""
    if isinstance(data, (bytes, bytearray)):
        data = io.BytesIO(bytes(data))
    with zipfile.ZipFile(data) as zf:
        with zf.open("word/document.xml") as fh:
            root = ElementTree.parse(fh).getroot()
    paragraphs: list[str] = []
    for p in root.iter(f"{_W_NS}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W_NS}tab":
                parts.append("\t")
            elif node.tag == f"{_W_NS}br":
                parts.append("\n")
        paragraphs.append("".join(parts))
    return "\n".join(paragraphs)


def scan_docx(spark: SparkSession, path: str) -> DataFrame:
    """Distributed multi-DOCX text extraction: (path, n_bytes,
    n_paragraphs, n_chars, text, error) per document."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[dD][oO][cC][xX]")
        .load(path)
        .where(F.col("path").rlike(r"(?i)\.docx$"))
        .select("path", "content")
    )

    def run(batches):
        for pdf in batches:
            out = {
                "path": [],
                "n_bytes": [],
                "n_paragraphs": [],
                "n_chars": [],
                "text": [],
                "error": [],
            }
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                out["path"].append(fpath)
                out["n_bytes"].append(len(data))
                try:
                    text = extract_docx_text(data)
                    err = None
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    text, err = "", f"{type(exc).__name__}: {exc}"
                out["n_paragraphs"].append(
                    len(text.split("\n")) if text else 0
                )
                out["n_chars"].append(len(text))
                out["text"].append(text)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return files.mapInPandas(run, DOCX_TEXT_SCHEMA)
