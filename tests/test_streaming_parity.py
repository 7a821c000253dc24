"""Streaming/batch parity on the REAL events table: the same
window()/session_window() expressions, run once through the batch
operators (oracle-certified) and once through Structured Streaming
micro-batches, must produce identical results. This pins the §2.12
claim that the batch oracle rows certify the streaming plans."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark.operators.eventwindows import (
    session_window_per_user,
    tumbling_window,
)
from ndl_core_data_pipeline_spark.streaming.jobs import (
    sessionized_stream,
    watermarked_tumbling_agg,
)

# arrival-typed schema (Spark 4.1 reads parquet TIMESTAMP(NANOS) as NTZ);
# the cast to session-TZ timestamp mirrors io.load's events branch
_STREAM_DDL = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


@pytest.fixture(
    scope="module",
    params=["clean", "nullheavy", "compound", "duprow", "duprow_compound"],
)
def twin_dirs(request, tmp_path_factory, sf_small):
    """(sf_dir, landing_dir) per tier. Clean = the real sf0.001 events
    table, always. The three hostile tiers (round-17 verdict item 5 —
    the fixtures that found the last 30 batch bugs, never before run
    through the streaming twins) build via their sweeps' own ensure
    functions and are gated behind SPARK_GRAFT_HOSTILE_TWINS=1."""
    import os
    import shutil

    if request.param == "clean":
        sf_dir = sf_small
    else:
        if not os.environ.get("SPARK_GRAFT_HOSTILE_TWINS"):
            pytest.skip(
                "set SPARK_GRAFT_HOSTILE_TWINS=1 for hostile-fixture twin runs"
            )
        from .conftest import ensure_hostile_dataset

        sf_dir = ensure_hostile_dataset(request.param)
    # the file stream source requires a directory; stage the events file
    d = tmp_path_factory.mktemp(f"events_landing_{request.param}")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return sf_dir, str(d)


def _events_stream(spark, landing_dir):
    s = spark.readStream.schema(_STREAM_DDL).parquet(landing_dir)
    return s.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_complete(df, name):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, twin_dirs):
    sf_dir, events_landing = twin_dirs
    batch = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in tumbling_window(spark, sf_dir).collect()
    }
    q = _run_complete(
        watermarked_tumbling_agg(_events_stream(spark, events_landing)),
        "tumb_parity",
    )
    try:
        streamed = {
            (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
            for r in spark.table("tumb_parity").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0


def test_session_stream_matches_batch(spark, twin_dirs):
    sf_dir, events_landing = twin_dirs
    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_window_per_user(spark, sf_dir).collect()
    }
    q = _run_complete(
        sessionized_stream(_events_stream(spark, events_landing)), "sess_parity"
    )
    try:
        streamed = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in spark.table("sess_parity").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0


def test_funnel_batch_stream_parity(spark, twin_dirs):
    """The streaming stage machine over the real (in-order-per-batch)
    events table must reach exactly the batch operator's funnel_stage for
    every user that entered the funnel."""
    from ndl_core_data_pipeline_spark.operators.eventwindows import funnel_steps
    from ndl_core_data_pipeline_spark.streaming.jobs import stateful_funnel

    sf_dir, events_landing = twin_dirs
    batch = {
        r["user_id"]: r["funnel_stage"]
        for r in funnel_steps(spark, sf_dir).collect()
    }
    q = (
        stateful_funnel(_events_stream(spark, events_landing))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_parity")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)  # False = still running → stale read
    finally:
        q.stop()
    stream = {
        r["user_id"]: r["stage"]
        for r in spark.sql(
            "SELECT user_id, MAX(funnel_stage) AS stage FROM funnel_parity "
            "GROUP BY user_id"
        ).collect()
    }
    assert stream == batch
