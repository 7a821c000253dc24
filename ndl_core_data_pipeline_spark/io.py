"""Testdata table loaders (TESTDATA.md layout: one parquet per table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's semantics depend on, applied even
    when the caller (e.g. the verify driver) built its own session: UTC
    timestamps for deterministic rendering/hashing, non-ANSI eval so failed
    parses yield NULL (the reference's permissive coercion semantics)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # with ANSI off, size()/cardinality() of NULL defaults to the legacy
    # -1 sentinel; the engine's semantics are NULL-in-NULL-out (matching
    # every oracle's len(NULL) = NULL — on dirty data the -1 leaks into
    # word counts and quality scores as a real-looking value)
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as long and truncate to micros (matching DuckDB, which
    # truncates ns→µs when reading the same file)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (reference S1: pq.read_table / pd.read_parquet,
    assets/processing/assets.py:409). Catalyst handles predicate pushdown
    and column pruning on top of this scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_defaults(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        # events.parquet stores ts as TIMESTAMP(NANOS). How it arrives depends
        # on the Spark version: with spark.sql.legacy.parquet.nanosAsLong in
        # effect it reads as BIGINT nanoseconds; Spark 4.1+ ignores that
        # runtime conf and reads it as TIMESTAMP_NTZ, already truncated to
        # micros. Branch on the actual dtype so both paths yield a session-TZ
        # (UTC) TIMESTAMP matching DuckDB's ns->us truncation of the same file.
        dtype = dict(df.dtypes)["ts"]
        if dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
