"""Ingestion golden tests — ports of the reference's pinned converter
behaviors (SURVEY §5, FIXTURES §1): null-token domain, 0.9 numeric ratio
("166,012,276" → 166012276, "58.39%" → 58.39), 0.5 date ratio with the
time-only guard ("15:00" must NOT become a date, "1 Mar 2023" MUST),
JSON struct flattening to dotted names (spatialReference.wkid int),
wrapper unwrap and error-payload skip."""

from __future__ import annotations

import json

import pytest

from pyspark.sql.types import LongType, DoubleType, StringType, TimestampType

from ndl_core_data_pipeline_spark.ingest import (
    infer_and_cast,
    infer_plan,
    read_csv_inferred,
    read_json_flat,
)


@pytest.fixture(scope="module")
def kpi_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "kpi.csv"
    rows = [
        "Reference,Metric,Amount,Pct,TestDate,ClockTime,Empty",
        'KPI 1,Completion Rate,"166,012,276",58.39%,1 Mar 2023,15:00,',
        "KPI 2,Throughput,£123,12.5%,2 Mar 2023,09:30,",
        "KPI 3,Latency,456.5,99%,2023-03-03,23:59,",
        "KPI 4,Uptime,789,0.1%,04/03/2023,08:15,",
        "KPI 5,Volume,1012,44%,5 March 2023,12:00,",
        "KPI 6,Errors,13,-,NA,07:45,",
        "KPI 7,Retries,14,3%,,06:30,",
        "KPI 8,Cache,15,4%,8 Mar 2023,05:00,",
        "KPI 9,Queue,16,5%,9 Mar 2023,04:10,",
        "KPI 10,Disk,17,6%,10 Mar 2023,03:20,",
    ]
    p.write_text("\n".join(rows))
    return str(p)


def test_csv_numeric_and_date_inference(spark, kpi_csv):
    df = read_csv_inferred(spark, kpi_csv)
    types = {f.name: type(f.dataType) for f in df.schema.fields}
    assert types["Amount"] is DoubleType  # "£123" + "456.5" mix → double
    assert types["Pct"] is DoubleType  # one "-" null token, rest numeric
    assert types["TestDate"] is TimestampType
    assert types["ClockTime"] is StringType  # time-only guard
    assert types["Empty"] is StringType  # all-null stays string
    rows = {r["Reference"]: r for r in df.collect()}
    assert rows["KPI 1"]["Amount"] == 166012276.0  # pinned golden
    assert rows["KPI 1"]["Pct"] == 58.39
    assert rows["KPI 6"]["Pct"] is None  # "-" → null
    assert rows["KPI 6"]["TestDate"] is None  # "NA" → null
    assert rows["KPI 1"]["TestDate"].strftime("%Y-%m-%d") == "2023-03-01"
    assert rows["KPI 4"]["TestDate"].strftime("%Y-%m-%d") == "2023-03-04"
    assert rows["KPI 5"]["TestDate"].strftime("%Y-%m-%d") == "2023-03-05"


def test_integer_column_becomes_long(spark, tmp_path):
    p = tmp_path / "ints.csv"
    p.write_text("a,b\n" + "\n".join(f"{i},{i}.5" for i in range(20)))
    df = read_csv_inferred(spark, str(p))
    types = {f.name: type(f.dataType) for f in df.schema.fields}
    assert types["a"] is LongType
    assert types["b"] is DoubleType
    assert df.agg({"a": "sum"}).collect()[0][0] == sum(range(20))


def test_numeric_threshold_is_90pct(spark, tmp_path):
    # 8/10 numeric = 0.8 < 0.9 → string survives
    p = tmp_path / "mixed.csv"
    vals = [str(i) for i in range(8)] + ["TBC", "unknown"]
    p.write_text("c\n" + "\n".join(vals))
    df = read_csv_inferred(spark, str(p))
    assert type(df.schema["c"].dataType) is StringType


def test_json_flatten_dotted_and_arrays(spark, tmp_path):
    p = tmp_path / "arcgis.json"
    p.write_text(
        json.dumps(
            {
                "displayFieldName": "NAME",
                "spatialReference": {"wkid": 27700, "latestWkid": 27700},
                "fields": [{"name": "OBJECTID", "type": "esriFieldTypeOID"}],
            }
        )
    )
    df = read_json_flat(spark, str(p))
    assert "spatialReference.wkid" in df.columns
    row = df.collect()[0]
    assert row["spatialReference.wkid"] == 27700  # pinned: integer column
    assert isinstance(row["fields"], str) and "OBJECTID" in row["fields"]


def test_json_wrapper_unwrap(spark, tmp_path):
    p = tmp_path / "wrapped.json"
    p.write_text(json.dumps({"results": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}))
    df = read_json_flat(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"id", "v"}


def test_json_error_payload_skipped(spark, tmp_path):
    p = tmp_path / "err.json"
    p.write_text(json.dumps({"error": {"code": 500, "message": "boom"}}))
    df = read_json_flat(spark, str(p))
    assert df.count() == 0


def test_infer_plan_reports_ratios(spark, tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("x\n1\n2\nn/a\n")
    raw = spark.read.option("header", "true").csv(str(p))
    plans = {pl.name: pl for pl in infer_plan(raw)}
    assert plans["x"].n_nonnull == 2  # "n/a" is a null token
    assert plans["x"].target == "long"
    assert infer_and_cast(raw).schema["x"].dataType.simpleString() == "bigint"


def test_time_utils_goldens(spark):
    # port of the reference's pinned parse_to_iso8601_utc behaviors
    # (tests/resources/test_time_utils.py:18-68): Z suffix, naive->UTC,
    # offset conversion, space separator, millisecond preservation,
    # date-only, English short month — via _parse_ts + functions.iso8601
    from pyspark.sql import functions as F

    from ndl_core_data_pipeline_spark.functions import iso8601
    from ndl_core_data_pipeline_spark.ingest.infer import _parse_ts

    cases = [
        ("2025-01-27T10:26:06Z", "2025-01-27T10:26:06+00:00"),
        ("2025-01-27T10:26:06", "2025-01-27T10:26:06+00:00"),
        ("2025-01-27T11:26:06+01:00", "2025-01-27T10:26:06+00:00"),
        ("2025-01-27 10:26:06", "2025-01-27T10:26:06+00:00"),
        ("2025-01-27T10:26:06.123Z", "2025-01-27T10:26:06.123+00:00"),
        # full microsecond precision, trailing zeros trimmed — matches
        # _format_dt_iso (time_utils.py:9-27): str(micro).rstrip('0')
        ("2025-01-27T10:26:06.123456Z", "2025-01-27T10:26:06.123456+00:00"),
        ("2025-01-27T10:26:06.000456Z", "2025-01-27T10:26:06.000456+00:00"),
        ("2025-01-27T10:26:06.123000Z", "2025-01-27T10:26:06.123+00:00"),
        ("2021-11-01", "2021-11-01T00:00:00+00:00"),
        ("1 Mar 2023", "2023-03-01T00:00:00+00:00"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["raw"])
    out = df.select("raw", iso8601(_parse_ts(F.col("raw"))).alias("iso")).collect()
    got = {r["raw"]: r["iso"] for r in out}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw])
