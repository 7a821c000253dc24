"""File-layout operators (SURVEY §2.5 A2, §2.3 F9, §2.9 X10) — the
reference's filesystem bookkeeping re-expressed over a synthetic file
listing derived deterministically from the documents table (both engines
compose byte-identical listings, so the oracle checks the operator, not
the filesystem).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load

# mime → extension excerpt of the reference's ~70-entry map
# (resources/api_client.py:105-187)
MIME_EXT = {
    "text/csv": ".csv",
    "application/json": ".json",
    "application/pdf": ".pdf",
    "text/html": ".html",
    "application/vnd.ms-excel": ".xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": ".xlsx",
    "application/vnd.oasis.opendocument.spreadsheet": ".ods",
    "application/xml": ".xml",
    "text/plain": ".txt",
    "application/zip": ".zip",
}


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


def content_type_extension(spark, sf_dir):
    """X10 (resources/api_client.py:105-187): content-type → extension
    literal-map lookup with text/* and +suffix fallbacks."""
    docs = load(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("lang") == "en", "text/csv")
        .when(F.col("lang") == "fr", "application/json")
        .when(F.col("lang") == "de", "application/octet-stream+zip")
        .otherwise("text/x-custom")
    )
    m = F.create_map(*[F.lit(x) for kv in MIME_EXT.items() for x in kv])
    ext = F.coalesce(
        m[F.col("mime")],
        # +suffix fallback: application/foo+zip → .zip
        F.when(
            F.col("mime").rlike(r"\+[A-Za-z0-9]+$"),
            F.concat(F.lit("."), F.regexp_extract(F.col("mime"), r"\+([A-Za-z0-9]+)$", 1)),
        ),
        # text/* fallback → .txt
        F.when(F.col("mime").startswith("text/"), ".txt"),
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
    reg.add(
        "files_content_type_extension",
        content_type_extension,
        f"""
SELECT doc_id, mime,
  CASE {ext_cases}
       WHEN regexp_matches(mime, '\\+[A-Za-z0-9]+$')
         THEN '.' || regexp_extract(mime, '\\+([A-Za-z0-9]+)$', 1)
       WHEN mime LIKE 'text/%' THEN '.txt'
       ELSE '.bin' END AS extension
FROM (
  SELECT doc_id,
    CASE lang WHEN 'en' THEN 'text/csv' WHEN 'fr' THEN 'application/json'
              WHEN 'de' THEN 'application/octet-stream+zip'
              ELSE 'text/x-custom' END AS mime
  FROM documents) t""",
    )
