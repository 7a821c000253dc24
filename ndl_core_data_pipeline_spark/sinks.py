"""Sinks (SURVEY §2.2): parquet writes with the reference's layout
conventions and status accounting.

- K1 single-table parquet write → df.write.parquet (task-commit protocol
  supplies the reference's temp-file+rename atomicity, K3, for free).
- K2 partitioned write + status sidecar (assets/processing/assets.py:
  230-263: one file per partition key plus a .status.json with row
  counts) → partitionBy + an observe()-collected metrics row written as
  JSON next to the data. Metrics come from the SAME job as the write —
  no second scan.
- K4 UUID-sharded layout (assets.py:349-361: first-2-hex-chars subdir to
  stay under 10k files/dir) → partitionBy on substring(identifier, 1, 2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.observation import Observation


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1: plain parquet write."""
    df.write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1 sibling: ORC write — the other native columnar format, same
    task-commit atomicity and pushdown/pruning machinery as parquet
    (tests/test_new_sources.py pins PushedFilters on the read-back path
    so format choice never silently costs the scan optimizations)."""
    df.write.mode(mode).orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


_AVRO_PROBE: dict[str, bool] = {}  # per-application memo (py4j call)


def _avro_available(spark) -> bool:
    """spark-avro is an EXTERNAL module (not on this sandbox's
    classpath); probe once per application so callers fail with a clear
    tier message instead of an AnalysisException mid-write. Keyed by
    applicationId, not id(jvm) — CPython recycles ids after GC, so an
    id key could serve a stale verdict across a gateway restart."""
    key = spark.sparkContext.applicationId
    if key in _AVRO_PROBE:
        return _AVRO_PROBE[key]
    try:
        # resolve through Spark's own provider lookup — a bundled class
        # can exist while the DataSource registration is absent, so
        # Class.forName probes the wrong thing
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        _AVRO_PROBE[key] = True
    except Exception:  # noqa: BLE001 — lookup failure == tier absent
        _AVRO_PROBE[key] = False
    return _AVRO_PROBE[key]


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro write — gated on the spark-avro module (same declared-tier
    posture as tesseract/presidio/sentence-transformers: the engine
    surface exists, the environment decides availability)."""
    spark = df.sparkSession
    if not _avro_available(spark):
        raise NotImplementedError(
            "avro tier unavailable: spark-avro external module not on the "
            "classpath (add org.apache.spark:spark-avro to --packages)"
        )
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark, path: str) -> DataFrame:
    if not _avro_available(spark):
        raise NotImplementedError(
            "avro tier unavailable: spark-avro external module not on the "
            "classpath (add org.apache.spark:spark-avro to --packages)"
        )
    return spark.read.format("avro").load(path)


def write_partitioned_with_status(
    df: DataFrame,
    path: str,
    partition_col: str,
    mode: str = "overwrite",
) -> dict:
    """K2: partitioned parquet + status sidecar. Returns the status dict
    and writes it to <path>/.status.json (driver-side file, mirroring the
    reference's sidecar)."""
    obs = Observation("write_status")
    text_col = "text" if "text" in df.columns else None
    # observe() rejects DISTINCT aggregates — approx_count_distinct is
    # allowed and exact at sidecar-relevant cardinalities
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.col(partition_col)).alias("n_partitions"),
    ]
    if text_col:
        metrics.append(
            F.count(F.when(F.length(F.col(text_col)) > 0, 1)).alias("n_with_text")
        )
    observed = df.observe(obs, *metrics)
    observed.write.mode(mode).partitionBy(partition_col).parquet(path)
    status = dict(obs.get)
    with open(os.path.join(path, ".status.json"), "w") as f:
        json.dump(status, f)
    return status


def uuid_shard_col(identifier_col: str = "identifier") -> F.Column:
    """K4: first-2-hex-chars shard key (256-way layout)."""
    return F.lower(F.substring(F.col(identifier_col), 1, 2)).alias("shard")


def write_uuid_sharded(df: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """K4: shard by uuid prefix; returns the K2-style status."""
    sharded = df.withColumn("shard", uuid_shard_col())
    return write_partitioned_with_status(sharded, path, "shard", mode=mode)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table write (saveAsTable — bucketing metadata lives in the
    catalog): pre-shuffles data into `n_buckets` hash buckets on the join/
    aggregation key so later equi-joins and groupBys between tables
    bucketed the same way run WITHOUT an exchange — the co-located-join
    strategy for repeated big-big joins at 100 TB (pay the shuffle once at
    write time, never at read time). Optional per-bucket sort enables
    sort-merge without the sort step. `path` makes it an external table
    (data at the given location instead of the warehouse dir)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction — the standing housekeeping job of any
    100 TB lake. Streaming ingests and fine-grained partitions leave
    thousands of KB-sized parquet files whose per-file open/footer cost
    dominates scans; this rewrites a directory into ceil(bytes/target)
    files of ~target size. With `sort_col`, output files are range-
    clustered (repartitionByRange + sortWithinPartitions) so each file
    carries tight min/max column stats and later range filters skip
    whole files; without it, a plain coalesce-style rewrite.

    Returns {"n_files_in", "n_files_out", "bytes_in"} for the caller's
    audit trail. Input size comes from the binaryFile LISTING (length is
    listing metadata; content is never projected, so no bytes are read)
    — works on any Hadoop-compatible filesystem, not just local."""
    import math
    import os

    # overwrite-while-reading the same directory would truncate the input
    # mid-scan and destroy it; the CLI exposes both paths freely
    if os.path.realpath(in_path) == os.path.realpath(out_path):
        raise ValueError(
            f"compact_parquet: out_path must differ from in_path ({in_path!r})"
        )
    stats = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(in_path)
        .select(F.sum("length").alias("b"), F.count("*").alias("n"))
        .first()
    )
    total = int(stats["b"] or 0)
    n_in = int(stats["n"])
    if n_in == 0:  # empty dir: nothing to rewrite, and schema inference
        return {"n_files_in": 0, "n_files_out": 0, "bytes_in": 0}  # would raise
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    if sort_col is not None:
        df = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    return {"n_files_in": n_in, "n_files_out": n_out, "bytes_in": total}


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_col,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE ZORDER write path: range-partition rows by a Morton/
    Z-order key (see operators/warehouse._spread16_sql for the key
    construction) and sort within each partition, so every output file
    covers a tight hyper-rectangle of the clustered dimensions — the
    parquet footer min/max stats then prune multi-dimensional predicates
    at scan time. Range partitioning samples the key distribution, so
    files are balanced even under skew; the sort is per-file, never
    global."""
    (
        df.withColumn("__z", zorder_col)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_zone_maps(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max zone maps of `cols` as a DataFrame — the stats a
    scan planner prunes with, computed from the data for layout audits
    (parquet footers hold the same bounds)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(F.count("*").alias("n_rows"), *aggs)
