"""Format readers: CSV / JSON scans with the reference's shaping rules.

- CSV (reference S2, resources/convertors/csv_to_parquet.py:52-69): read
  everything as string (header on), then apply the inference pass. Encoding
  detection: the reference uses charset-normalizer on the whole file; at
  scale we sniff a bounded prefix driver-side (UTF-8 → UTF-8-sig → latin-1
  fallback chain, charset_normalizer if importable) and hand Spark the
  winner — the scan itself stays distributed.
- JSON (reference S3, resources/convertors/json_to_parquet.py:37-149):
  spark.read.json, then (a) unwrap a single wrapper column data|results|
  rows|items holding an array of records, (b) recursively flatten structs
  into dotted column names (test-pinned: spatialReference.wkid),
  (c) serialize residual arrays/maps to JSON strings, (d) error payloads
  {"error": ...} yield an empty frame (reference returns None).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from .infer import infer_and_cast

WRAPPER_KEYS = ("data", "results", "rows", "items")  # json_to_parquet.py:118-149


def detect_encoding(path: str, sample_bytes: int = 1 << 20) -> str:
    """Bounded driver-side sniff. charset_normalizer when available
    (reference parity), else BOM/UTF-8 trial decode with latin-1 fallback."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    try:
        from charset_normalizer import from_bytes  # optional dep

        best = from_bytes(head).best()
        if best and best.encoding:
            # python codec name → charset Spark's CSVOptions accepts
            enc = best.encoding.replace("_", "-").lower()
            return {"ascii": "us-ascii", "utf-8-sig": "utf-8", "cp1252": "iso-8859-1"}.get(enc, enc)
    except ImportError:
        pass
    if head.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"  # Spark strips the BOM with explicit UTF-8
    try:
        head.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def read_csv_inferred(
    spark: SparkSession, path: str, encoding: str | None = None
) -> DataFrame:
    """All-string CSV scan + type inference (S2). The scan is distributed;
    only the encoding sniff touches the driver."""
    enc = encoding or detect_encoding(path)
    raw = (
        spark.read.option("header", "true")
        .option("encoding", enc)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return infer_and_cast(raw)


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten StructType columns into dotted names; serialize
    arrays/maps to JSON strings (json_to_parquet.py:78,85 semantics)."""
    while True:
        cols = []
        flattened = False
        for field in df.schema.fields:
            name = field.name
            if isinstance(field.dataType, StructType):
                flattened = True
                for sub in field.dataType.fields:
                    cols.append(
                        F.col(f"`{name}`.`{sub.name}`").alias(f"{name}{sep}{sub.name}")
                    )
            else:
                cols.append(F.col(f"`{name}`"))
        if not flattened:
            break
        df = df.select(*cols)
    out = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (ArrayType, MapType)):
            out.append(F.to_json(F.col(f"`{field.name}`")).alias(field.name))
        else:
            out.append(F.col(f"`{field.name}`"))
    return df.select(*out)


def read_json_flat(spark: SparkSession, path: str) -> DataFrame:
    """JSON scan with wrapper unwrap + struct flatten (S3)."""
    df = spark.read.option("multiLine", "true").json(path)
    names = set(df.columns)
    if names == {"error"}:
        # {"error": ...} payload → skipped (json_to_parquet.py:61-64)
        return df.limit(0)
    for w in WRAPPER_KEYS:
        if w in names:
            field = df.schema[w].dataType
            if isinstance(field, ArrayType) and isinstance(field.elementType, StructType):
                df = df.select(F.explode(F.col(w)).alias("_rec")).select("_rec.*")
                break
    return flatten_structs(df)
