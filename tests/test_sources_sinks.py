"""Crawl fan-out + sink layout tests (no network: fetchers are local fakes)."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark import sinks
from ndl_core_data_pipeline_spark.sources import (
    RateLimiter,
    fetch_offsets,
    offset_batches,
    skip_existing,
)
from ndl_core_data_pipeline_spark.sources.crawl import with_retry


def test_offset_batches(spark):
    rows = offset_batches(spark, total=250, batch_size=100).collect()
    assert [(r["batch_id"], r["offset"]) for r in rows] == [(0, 0), (1, 100), (2, 200)]


def test_fetch_offsets_fans_out(spark):
    def fake_page(offset, count):
        n_total = 250
        return [
            {"doc_id": i, "title": f"doc-{i}"}
            for i in range(offset, min(offset + count, n_total))
        ]

    batches = offset_batches(spark, total=250, batch_size=100)
    got = fetch_offsets(
        batches, fake_page, "doc_id BIGINT, title STRING", rate_per_second=0
    )
    rows = got.collect()
    assert len(rows) == 250
    assert {r["doc_id"] for r in rows} == set(range(250))
    # batch attribution survives
    assert {r["batch_id"] for r in rows if r["doc_id"] < 100} == {0}


def test_fetch_retry_then_success(spark):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky) == "ok"
    assert calls["n"] == 3

    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        with_retry(always_fails)


def test_rate_limiter_paces():
    rl = RateLimiter(rate_per_second=50)  # 20ms interval
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.07  # 4 gaps x 20ms, with slack


def test_skip_existing(spark):
    work = spark.createDataFrame([(i,) for i in range(10)], "key BIGINT")
    have = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "key BIGINT")
    todo = skip_existing(work, have, "key").collect()
    assert sorted(r["key"] for r in todo) == [1, 3, 5, 7, 9]


def test_partitioned_write_with_status(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"{i:02x}{i:06d}", f"text {i}" if i % 2 else "", f"s{i % 3}") for i in range(30)],
        "identifier STRING, text STRING, source STRING",
    )
    path = str(tmp_path / "out")
    status = sinks.write_partitioned_with_status(df, path, "source")
    assert status["n_rows"] == 30
    assert status["n_partitions"] == 3
    assert status["n_with_text"] == 15
    sidecar = json.load(open(path + "/.status.json"))
    assert sidecar == status
    back = spark.read.parquet(path)
    assert back.count() == 30
    assert back.select(F.countDistinct("source")).collect()[0][0] == 3


def test_uuid_sharded_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"{i % 4:02x}-rest-{i}", "t") for i in range(40)], "identifier STRING, text STRING"
    )
    path = str(tmp_path / "sharded")
    status = sinks.write_uuid_sharded(df, path)
    assert status["n_rows"] == 40
    assert status["n_partitions"] == 4
    # the K4 contract is the on-disk layout (first-2-hex-chars dirs);
    # spark's partition-value inference reads them back as ints
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    assert dirs == {"shard=00", "shard=01", "shard=02", "shard=03"}
