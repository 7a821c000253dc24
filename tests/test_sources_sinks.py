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
from ndl_core_data_pipeline_spark.sources import crawl
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


def test_follow_next_links_walks_feed(spark):
    # 3-page fake Atom feed; page 2 links back to page 0 (cycle guard)
    def feed(page, nxt):
        entries = "".join(
            f'<entry><id>e{page}-{i}</id><title>T{page}-{i}</title>'
            f'<updated>2025-01-0{page+1}</updated>'
            f'<link rel="alternate" href="http://x/{page}/{i}"/></entry>'
            for i in range(2)
        )
        nl = f'<link rel="next" href="{nxt}"/>' if nxt else ""
        return (
            '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
            + nl + entries + "</feed>"
        )

    pages = {
        "p0": feed(0, "p1"),
        "p1": feed(1, "p2"),
        "p2": feed(2, "p0"),  # cycle back — walk must stop
    }
    df = crawl.follow_next_links(
        spark,
        "p0",
        pages.__getitem__,
        "entry_id STRING, title STRING, updated STRING, links ARRAY<STRING>",
        rate_per_second=0.0,
    )
    rows = df.orderBy("page_no", "entry_id").collect()
    assert [r["entry_id"] for r in rows] == [
        "e0-0", "e0-1", "e1-0", "e1-1", "e2-0", "e2-1",
    ]
    assert rows[0]["links"] == ["http://x/0/0"]
    assert {r["page_no"] for r in rows} == {0, 1, 2}


def test_parse_atom_page_next_and_entries():
    entries, nxt = crawl.parse_atom_page(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<link rel="self" href="here"/><link rel="NEXT" href="there"/>'
        "<entry><id> e1 </id><title>t</title><updated>u</updated>"
        '<link href="a"/><link href="b"/></entry></feed>'
    )
    assert nxt == "there"  # rel matched case-insensitively
    assert entries == [
        {"entry_id": "e1", "title": "t", "updated": "u", "links": ["a", "b"]}
    ]


def test_parse_atom_page_ignores_entry_level_next():
    # an <entry>'s own rel='next' must not be mistaken for feed pagination
    entries, nxt = crawl.parse_atom_page(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><id>e1</id><link rel="next" href="WRONG"/></entry>'
        '<link rel="next" href="right"/></feed>'
    )
    assert nxt == "right"
    # and with no feed-level next at all, the walk ends
    _, none_next = crawl.parse_atom_page(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><id>e1</id><link rel="next" href="WRONG"/></entry></feed>'
    )
    assert none_next is None


def test_guess_extension_tiers():
    from ndl_core_data_pipeline_spark.operators.files import MIME_EXT, guess_extension

    assert len(MIME_EXT) == 57  # full reference map (api_client.py:116-177)
    assert guess_extension("application/vnd.rar") == ".rar"
    assert guess_extension("audio/x-flac; charset=binary") == ".flac"
    assert guess_extension("text/x-custom") == ".txt"  # text/* fallback
    assert guess_extension("text/x-markdown") == ".md"  # text subtype map
    assert guess_extension("application/vnd.custom+xml") == ".xml"  # +suffix
    assert guess_extension("application/vnd.custom+weird") is None
    assert guess_extension(None) is None
    assert guess_extension("") is None


def test_compact_parquet_small_files(spark, tmp_path):
    from ndl_core_data_pipeline_spark.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    # 40 tiny files — the post-streaming-ingest shape compaction fixes
    spark.range(0, 4000).withColumnRenamed("id", "k").repartition(40).write.parquet(src)
    out = str(tmp_path / "compacted")
    stats = compact_parquet(spark, src, out, target_file_bytes=10 * 1024 * 1024)
    assert stats["n_files_in"] == 40 and stats["n_files_out"] == 1
    assert stats["bytes_in"] > 0
    got = spark.read.parquet(out)
    assert got.count() == 4000
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 1


def test_compact_parquet_range_clustered(spark, tmp_path):
    from ndl_core_data_pipeline_spark.sinks import compact_parquet
    import glob
    import pyarrow.parquet as pq

    src = str(tmp_path / "frag2")
    spark.range(0, 10000).withColumnRenamed("id", "k").repartition(20).write.parquet(src)
    out = str(tmp_path / "clustered")
    # force multiple output files to observe the range clustering
    compact_parquet(spark, src, out, target_file_bytes=8 * 1024, sort_col="k")
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) > 1
    # each file's [min,max] of k must be disjoint from every other's —
    # the property that lets range filters skip whole files
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])
        ks = t.column("k").to_pylist()
        assert ks == sorted(ks)  # sortWithinPartitions held
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_compact_parquet_guards(spark, tmp_path):
    import pytest as _pytest

    from ndl_core_data_pipeline_spark.sinks import compact_parquet

    src = str(tmp_path / "same")
    spark.range(10).write.parquet(src)
    # in-place compaction would truncate the input mid-read: refuse
    with _pytest.raises(ValueError, match="must differ"):
        compact_parquet(spark, src, src)
    with _pytest.raises(ValueError, match="must differ"):
        compact_parquet(spark, src, src + "/../same")
    # empty input dir: no-op stats, no schema-inference crash
    empty = tmp_path / "empty"
    empty.mkdir()
    stats = compact_parquet(spark, str(empty), str(tmp_path / "out"))
    assert stats == {"n_files_in": 0, "n_files_out": 0, "bytes_in": 0}


def test_orc_roundtrip_with_pushdown(spark, sf_small, tmp_path):
    """ORC round-trip preserves rows AND the scan-level optimizations:
    filters and column pruning must reach the ORC reader just like
    parquet (PushedFilters + narrow ReadSchema in the plan)."""
    from pyspark.sql import functions as F

    from ndl_core_data_pipeline_spark.io import load
    from ndl_core_data_pipeline_spark.plans.audit import explain_formatted
    from ndl_core_data_pipeline_spark.sinks import read_orc, write_orc

    src = load(spark, sf_small, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.count() == src.count()
    q = back.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice"
    )
    plan = explain_formatted(q)
    assert "PushedFilters" in plan and "o_orderpriority,1-URGENT" in plan
    assert "ReadSchema: struct<o_orderkey:" in plan  # pruned to 3 cols
    n_urgent_orc = q.count()
    n_urgent_pq = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert n_urgent_orc == n_urgent_pq


def test_python_datasource_paged_feed(spark):
    """Spark-4 custom Python DataSource: partition planning (one task per
    page range), full row coverage, and DataFrame ops on top."""
    from pyspark.sql import functions as F

    from ndl_core_data_pipeline_spark.sources.pyds import PAGE_SIZE, register

    register(spark)
    df = (
        spark.read.format("paged_feed")
        .option("npages", 6)
        .option("pagesPerPartition", 2)
        .load()
    )
    assert df.count() == 6 * PAGE_SIZE
    assert df.rdd.getNumPartitions() == 3  # 6 pages / 2 per partition
    # every page complete, no dupes, and Catalyst ops compose on top
    per_page = {r["page"]: r["n"] for r in df.groupBy("page").agg(F.count("*").alias("n")).collect()}
    assert per_page == {p: PAGE_SIZE for p in range(6)}
    assert df.select("item_id").distinct().count() == 6 * PAGE_SIZE
    cats = df.filter(F.col("category") == "health").count()
    assert cats > 0


def test_python_datasource_streaming_feed(spark, tmp_path):
    """Spark-4 SimpleDataSourceStreamReader: offsets advance per
    micro-batch, every page lands exactly once, replay is deterministic."""
    from pyspark.sql import functions as F

    from ndl_core_data_pipeline_spark.sources.pyds import PAGE_SIZE, register_stream

    register_stream(spark)
    stream = (
        spark.readStream.format("paged_feed_stream")
        .option("npages", 6)
        .option("pagesPerBatch", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # the offline feed is finite: poll until all 6 pages have landed
    # (availableNow processes only the first prefetched batch for custom
    # simple stream readers, so run the continuous trigger and stop)
    import time

    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM feed_stream").collect()[0][0] == 6 * PAGE_SIZE:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM feed_stream")
    assert got.count() == 6 * PAGE_SIZE  # exactly once, all pages
    per_page = {
        r["page"]: r["n"]
        for r in got.groupBy("page").agg(F.count("*").alias("n")).collect()
    }
    assert per_page == {p: PAGE_SIZE for p in range(6)}


def test_schema_evolution_merge_read(spark, tmp_path):
    """Lake reality: a dataset written over months gains columns. A
    mergeSchema read must unify old and new files (nulls backfill the
    old ones) — the evolution story any 100 TB table needs."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, name STRING"
    ).write.parquet(out + "/batch=1")
    spark.createDataFrame(
        [(3, "c", 0.5)], "id BIGINT, name STRING, score DOUBLE"
    ).write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").option(
        "basePath", out
    ).parquet(out)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 0.5


def test_corrupt_file_tolerance(spark, tmp_path):
    """One truncated parquet file must not kill a directory scan when
    ignoreCorruptFiles is on — per-file fault isolation at the reader
    tier (same posture as the workbook/PDF scan error rows)."""
    out = tmp_path / "with_corrupt"
    out.mkdir()
    spark.createDataFrame([(1,), (2,)], "id BIGINT").write.mode(
        "overwrite"
    ).parquet(str(out / "good"))
    (out / "good" / "junk.parquet").write_bytes(b"PAR1 this is not parquet")
    # explicit schema: footer-based inference has no row to skip to, so a
    # production lake read pins the schema and lets the scan skip bad files
    df = (
        spark.read.schema("id BIGINT")
        .option("ignoreCorruptFiles", "true")
        .parquet(str(out / "good"))
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
