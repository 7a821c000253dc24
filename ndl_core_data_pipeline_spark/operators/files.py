"""File-layout operators (SURVEY §2.5 A2, §2.3 F9, §2.9 X10) — the
reference's filesystem bookkeeping re-expressed over a synthetic file
listing derived deterministically from the documents table (both engines
compose byte-identical listings, so the oracle checks the operator, not
the filesystem).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load

# content-type → extension, full parity with the reference's map
# (resources/api_client.py:116-177 `common`); extensions carry the
# leading dot (this repo's path-building convention)
MIME_EXT = {
    "text/csv": ".csv",
    "text/tab-separated-values": ".tsv",
    "text/tsv": ".tsv",
    "application/tsv": ".tsv",
    "text/x-tab-separated-values": ".tsv",
    "application/pdf": ".pdf",
    "application/json": ".json",
    "application/ld+json": ".json",
    "application/vnd.api+json": ".json",
    "application/xml": ".xml",
    "text/xml": ".xml",
    "text/plain": ".txt",
    "text/html": ".html",
    "text/markdown": ".md",
    "application/zip": ".zip",
    "application/x-7z-compressed": ".7z",
    "application/gzip": ".gz",
    "application/x-gzip": ".gz",
    "application/x-tar": ".tar",
    "application/x-bzip2": ".bz2",
    "application/x-xz": ".xz",
    "application/x-rar-compressed": ".rar",
    "application/msword": ".doc",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": ".docx",
    "application/vnd.ms-excel": ".xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": ".xlsx",
    "application/vnd.ms-powerpoint": ".ppt",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": ".pptx",
    "application/vnd.oasis.opendocument.spreadsheet": ".ods",
    "application/vnd.oasis.opendocument.text": ".odt",
    "image/png": ".png",
    "image/jpeg": ".jpg",
    "image/jpg": ".jpg",
    "image/gif": ".gif",
    "image/svg+xml": ".svg",
    "image/tiff": ".tif",
    "image/webp": ".webp",
    "image/bmp": ".bmp",
    "audio/mpeg": ".mp3",
    "audio/mp3": ".mp3",
    "audio/wav": ".wav",
    "audio/x-wav": ".wav",
    "audio/ogg": ".ogg",
    "audio/opus": ".opus",
    "audio/aac": ".aac",
    "audio/flac": ".flac",
    "audio/x-flac": ".flac",
    "video/mp4": ".mp4",
    "video/mpeg": ".mpeg",
    "video/quicktime": ".mov",
    "video/x-msvideo": ".avi",
    "video/x-ms-wmv": ".wmv",
    "video/x-flv": ".flv",
    "application/rtf": ".rtf",
    "application/x-iso9660-image": ".iso",
    "font/ttf": ".ttf",
    "application/vnd.rar": ".rar",
}

# text/* subtype map for the text fallback tier (api_client.py:181-184)
TEXT_SUBTYPE_EXT = {
    "csv": ".csv",
    "tsv": ".tsv",
    "tab-separated-values": ".tsv",
    "x-tab-separated-values": ".tsv",
    "plain": ".txt",
    "markdown": ".md",
    "x-markdown": ".md",
}

# vendor +suffix map for the last-resort tier (api_client.py:186-189)
SUFFIX_EXT = {"json": ".json", "xml": ".xml", "zip": ".zip", "csv": ".csv", "tsv": ".tsv"}


def guess_extension(content_type: str | None) -> str | None:
    """Driver-side X10 (api_client.py:110-190): parameters stripped,
    stdlib mimetypes first, then the literal map, then the text/* and
    +suffix fallbacks. Returns a dotted extension or None."""
    import mimetypes

    if not content_type:
        return None
    ct = content_type.split(";", 1)[0].strip()
    ext = mimetypes.guess_extension(ct)
    if ext:
        return ext
    if ct in MIME_EXT:
        return MIME_EXT[ct]
    if ct.startswith("text/"):
        return TEXT_SUBTYPE_EXT.get(ct.split("/", 1)[1], ".txt")
    if "+" in ct:
        return SUFFIX_EXT.get(ct.split("+", 1)[1])
    return None


def _listing(docs):
    """Synthetic file listing: every doc yields a data file (extension by
    lang) and every 3rd doc a *_metadata.json sidecar — the data.gov.uk
    landing layout (FIXTURES §2.4)."""
    ext = (
        F.when(F.col("lang") == "en", ".csv")
        .when(F.col("lang") == "fr", ".json")
        .when(F.col("lang") == "de", ".pdf")
        .otherwise(".html")
    )
    data = docs.select(
        F.concat(F.lit("land/d"), F.col("doc_id"), ext).alias("path")
    )
    meta = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("land/d"), F.col("doc_id"), F.lit("_metadata.json")).alias(
            "path"
        )
    )
    return data.unionAll(meta)


def count_by_extension(spark, sf_dir):
    """A2 (resources/count_extensions.py:47-73): recursive walk → Counter
    by suffix, ignoring *_metadata.json; descending count."""
    docs = load(spark, sf_dir, "documents")
    files = _listing(docs).filter(~F.col("path").endswith("_metadata.json"))
    ext = F.regexp_extract(F.col("path"), r"(\.[A-Za-z0-9]+)$", 1)
    return (
        files.select(ext.alias("extension"))
        .groupBy("extension")
        .count()
        .orderBy(F.desc("count"), "extension")
    )


def metadata_data_pairs(spark, sf_dir):
    """F9 (assets/processing/assets.py:330-346,376-392): classify
    *_metadata.json sidecars, pair each with its sibling data file by
    derived basename — string predicates + equi-join on the derived key."""
    docs = load(spark, sf_dir, "documents")
    files = _listing(docs)
    is_meta = F.col("path").endswith("_metadata.json")
    meta = files.filter(is_meta).select(
        F.regexp_replace(F.col("path"), "_metadata\\.json$", "").alias("basename"),
        F.col("path").alias("metadata_path"),
    )
    data = files.filter(~is_meta).select(
        F.regexp_replace(F.col("path"), r"\.[A-Za-z0-9]+$", "").alias("basename"),
        F.col("path").alias("data_path"),
    )
    return meta.join(data, "basename").select("basename", "metadata_path", "data_path")


# 12 representative content types cycled by doc_id — hits the literal map
# (incl. +containing keys like image/svg+xml), the text/* subtype tier,
# the vendor +suffix tier, and the unknown default
QUERY_MIMES = (
    "text/csv",
    "application/pdf",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "audio/mpeg",
    "video/quicktime",
    "image/svg+xml",
    "application/x-7z-compressed",
    "text/markdown",
    "text/x-custom",
    "application/vnd.custom+xml",
    "application/octet-stream",
    "font/ttf",
)


def content_type_extension(spark, sf_dir):
    """X10 (resources/api_client.py:105-190): content-type → extension.
    Tier order mirrors the reference: literal map, then text/* subtype
    map (default .txt), then vendor +suffix map, then unknown (.bin —
    the reference's None rendered as a default). The stdlib `mimetypes`
    first-tier exists driver-side in guess_extension(); the distributed
    form uses the literal map only so the oracle can reproduce it."""
    docs = load(spark, sf_dir, "documents")
    # pmod, not %: a NEGATIVE doc_id keeps Java's dividend sign, making
    # the 1-based index 0 (element_at RAISES) or negative (silently
    # counts from the END — and DuckDB's list[-k] happens to agree, so
    # the 0.5% extreme-BIGINT tier passed by coincidence; the 5%
    # escalation probe hit the index-0 crash)
    mime = F.element_at(
        F.array(*[F.lit(m) for m in QUERY_MIMES]),
        (F.pmod(F.col("doc_id"), F.lit(len(QUERY_MIMES))) + 1).cast("int"),
    )
    m = F.create_map(*[F.lit(x) for kv in MIME_EXT.items() for x in kv])
    tm = F.create_map(*[F.lit(x) for kv in TEXT_SUBTYPE_EXT.items() for x in kv])
    sm = F.create_map(*[F.lit(x) for kv in SUFFIX_EXT.items() for x in kv])
    ext = F.coalesce(
        m[F.col("mime")],
        F.when(
            F.col("mime").startswith("text/"),
            F.coalesce(
                tm[F.regexp_extract(F.col("mime"), r"^text/(.+)$", 1)], F.lit(".txt")
            ),
        ),
        F.when(
            F.col("mime").rlike(r"\+[A-Za-z0-9]+$"),
            sm[F.regexp_extract(F.col("mime"), r"\+([A-Za-z0-9]+)$", 1)],
        ),
        F.lit(".bin"),
    )
    return docs.select("doc_id", mime.alias("mime")).select(
        "doc_id", "mime", ext.alias("extension")
    )


def register(reg):
    listing_sql = """
listing AS (
  SELECT 'land/d' || CAST(doc_id AS VARCHAR) ||
         CASE lang WHEN 'en' THEN '.csv' WHEN 'fr' THEN '.json'
                   WHEN 'de' THEN '.pdf' ELSE '.html' END AS path
  FROM documents
  UNION ALL
  SELECT 'land/d' || CAST(doc_id AS VARCHAR) || '_metadata.json' AS path
  FROM documents WHERE doc_id % 3 = 0
)"""
    reg.add(
        "files_count_by_extension",
        count_by_extension,
        "WITH "
        + listing_sql
        + r"""
SELECT regexp_extract(path, '(\.[A-Za-z0-9]+)$', 1) AS extension, COUNT(*) AS count
FROM listing WHERE NOT path LIKE '%\_metadata.json' ESCAPE '\'
GROUP BY 1 ORDER BY count DESC, extension""",
    )
    reg.add(
        "files_metadata_pairs",
        metadata_data_pairs,
        "WITH "
        + listing_sql
        + r""",
meta AS (SELECT regexp_replace(path, '_metadata\.json$', '') AS basename, path AS metadata_path
         FROM listing WHERE path LIKE '%\_metadata.json' ESCAPE '\'),
data AS (SELECT regexp_replace(path, '\.[A-Za-z0-9]+$', '') AS basename, path AS data_path
         FROM listing WHERE NOT path LIKE '%\_metadata.json' ESCAPE '\')
SELECT meta.basename, metadata_path, data_path FROM meta JOIN data USING (basename)""",
    )
    ext_cases = " ".join(f"WHEN mime = '{k}' THEN '{v}'" for k, v in MIME_EXT.items())
    text_cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in TEXT_SUBTYPE_EXT.items()
    )
    suffix_cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in SUFFIX_EXT.items())
    mime_list = ", ".join(f"'{m}'" for m in QUERY_MIMES)
    reg.add(
        "files_content_type_extension",
        content_type_extension,
        f"""
SELECT doc_id, mime,
  CASE {ext_cases}
       WHEN mime LIKE 'text/%' THEN
         CASE regexp_extract(mime, '^text/(.+)$', 1) {text_cases} ELSE '.txt' END
       WHEN regexp_matches(mime, '\\+[A-Za-z0-9]+$') THEN
         CASE regexp_extract(mime, '\\+([A-Za-z0-9]+)$', 1) {suffix_cases} ELSE '.bin' END
       ELSE '.bin' END AS extension
FROM (
  SELECT doc_id, ([{mime_list}])[CAST(((doc_id % {len(QUERY_MIMES)}) + {len(QUERY_MIMES)}) % {len(QUERY_MIMES)} AS INT) + 1] AS mime
  FROM documents) t""",
    )
