"""ndl_core_data_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of theodi/ndl-core-data-pipeline.

Brand-new Spark-first design (DataFrame/SQL + Catalyst), NOT a port: the
reference is an eager pandas/Dagster ETL+RAG pipeline; here every operator is
a lazy ``DataFrame -> DataFrame`` transformation so Catalyst owns predicate
pushdown, column pruning, join strategy and partial aggregation, and the same
code scales from local[32] to a 1000-executor cluster.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC).
- ``schema``     canonical record StructType (reference §1.2).
- ``io``         testdata table loaders.
- ``operators``  relational / dedup / vector / text / window ops.
- ``sources``    ingestion: CSV/JSON/spreadsheet type inference, binary scans.
- ``functions``  scalar function library (dates, licenses, slugs, cleaning).
- ``plans``      end-to-end pipeline compositions (the reference's jobs).
- ``streaming``  Structured Streaming superset (windows, sessions, watermark).
"""

__version__ = "0.1.0"
