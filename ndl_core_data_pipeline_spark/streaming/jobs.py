"""Structured Streaming jobs — the streaming superset of the reference's
orchestration-level incrementality (SURVEY §2.12).

Mapping from the reference's mechanisms:
- Dagster dynamic partitions + sensor (one run per discovered batch,
  assets/gov_uk/assets.py:18,51-54; definitions.py:35-71) →
  file-source stream + Trigger.AvailableNow: each newly landed file is
  discovered, processed exactly once, and checkpointed.
- Skip-if-exists idempotency (F8, gov_uk assets.py:92-95) →
  dropDuplicates on the record key with watermark-bounded state.
- Static manifest batches of 1000 (assets/processing/assets.py:56-77) →
  maxFilesPerTrigger batching.
- Crawl-from watermark (gov_uk assets.py:20,41) → withWatermark on the
  event-time column.

True streaming operators (tumbling/sliding/session windows, late-data
handling) are absent from the reference; they're exposed here over the
events shape. The window expressions are IDENTICAL to the batch forms in
operators/eventwindows.py — the oracle-checked batch results certify
these plans (Spark reuses the same logical operators in micro-batches).

All jobs take/return unstarted handles so callers own trigger/sink
configuration; tests use Trigger.AvailableNow into temp sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter

from .._compat import dsum_expr

EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def available_now_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    schema_ddl: str = EVENTS_DDL,
    max_files_per_trigger: int | None = None,
) -> DataStreamWriter:
    """File-source ingest: discover whatever has landed, process it as
    micro-batches, stop (Trigger.AvailableNow) — the streaming analog of
    one sensor sweep. Restart-safe via the checkpoint."""
    reader = spark.readStream.format(fmt).schema(schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(landing_dir)
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_dedup(stream: DataFrame, key: str = "event_id", watermark: str = "1 hour") -> DataFrame:
    """Exactly-once materialization of an at-least-once feed: drop
    duplicate keys, with state bounded by the event-time watermark
    (reference analog: skip-if-exists anti-join, F8)."""
    return stream.withWatermark("ts", watermark).dropDuplicates([key, "ts"])


def watermarked_tumbling_agg(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time aggregation with late-data tolerance. Same
    window() expression as operators/eventwindows.tumbling_window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum_expr(F.col("value"), "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total carried across micro-batches in
    explicit GroupState — the form for stateful logic that built-in
    window/dedup operators can't express (reference analog: none; this is
    the engine's extension point for custom accumulators)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    # r19 (guide §4.1/§2.3): the stateful operator is opaque to column
    # pruning — without the explicit select the state shuffle and the
    # Arrow boundary carry every input column (events' `props` JSON
    # payload included) for a function that reads only `value`.
    return stream.select("user_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each micro-batch with a dimension table.
    The static side is re-read per micro-batch (so slowly-changing dims are
    picked up) and broadcast when small — the streaming analog of the
    reference's tag-merge J1. No watermark needed: the static side never
    grows state."""
    return stream.join(F.broadcast(dim), key, "left")


def foreach_batch_writer(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    dedup_key: str | None = None,
):
    """foreachBatch sink: per micro-batch custom write with exactly-once
    semantics from (checkpointed batch_id + idempotent write). The batch
    body runs full batch-DataFrame logic (joins, dedup, arbitrary sinks) —
    the extension point the built-in sinks can't express (reference
    analog: per-partition atomic write + status sidecar, K2/K3)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if dedup_key:
            out = out.dropDuplicates([dedup_key])
        # partition dir keyed by batch_id: re-running a failed batch
        # overwrites its own output only — idempotent replay
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with a time-bound correlation: each left
    event matches right events of the same user arriving within
    `max_delay` AFTER it (view→click attribution shape). BOTH sides carry
    watermarks and the join condition bounds event time on both ends —
    that pair is what lets Spark expire join state instead of buffering
    the streams forever (the only stream-stream shape that survives an
    unbounded feed)."""
    l = left.select(
        F.col("user_id"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    ).withWatermark("left_ts", watermark)
    r = right.select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    ).withWatermark("right_ts", watermark)
    return l.join(
        r,
        F.expr(
            "user_id = r_user_id AND right_ts >= left_ts "
            f"AND right_ts <= left_ts + interval {max_delay}"
        ),
    ).select("user_id", "left_id", "right_id", "left_ts", "right_ts")


def observed_tumbling_agg(
    stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """watermarked_tumbling_agg with per-micro-batch observability:
    observe() counts input rows and event-time bounds BEFORE the stateful
    aggregation, so every StreamingQueryProgress carries (n_input,
    min_ts, max_ts) alongside the state operator's
    numRowsDroppedByWatermark — together the complete late-data audit
    (how much arrived, how late, how much the watermark discarded).

    NB: the watermark a micro-batch filters with derives from data at
    least one batch earlier, so a straggler is only guaranteed dropped
    once a FULL batch has run after the data that advanced the watermark
    past it (pinned in tests/test_streaming.py)."""
    observed = stream.observe(
        "ingest",
        F.count(F.lit(1)).alias("n_input"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    return watermarked_tumbling_agg(observed, window=window, watermark=watermark)


def late_data_metrics(query) -> dict:
    """Late-data audit extracted from a StreamingQuery's progress history:
    total observed input rows, total rows the watermark dropped, and the
    per-batch observed event-time bounds. Works on a finished
    AvailableNow run or a live query.

    `recentProgress` retains only the last
    spark.sql.streaming.numRecentProgressUpdates entries (default 100) —
    a longer backfill silently truncates, so the result carries a
    `truncated` flag; raise that conf (or aggregate per-restart) for
    100+-batch runs."""
    import json as _json

    from pyspark.sql import SparkSession

    progress = list(query.recentProgress)
    cap = 100
    session = SparkSession.getActiveSession()
    if session is not None:
        try:
            cap = int(
                session.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
            )
        except Exception:
            pass
    n_input, dropped, batches = 0, 0, []
    for prog in progress:
        p = _json.loads(prog.json) if hasattr(prog, "json") else prog
        for so in p.get("stateOperators", []):
            dropped += int(so.get("numRowsDroppedByWatermark", 0) or 0)
        om = (p.get("observedMetrics") or {}).get("ingest")
        if om and om.get("n_input"):
            n_input += int(om["n_input"])
            batches.append(
                {
                    "batch_id": p.get("batchId"),
                    "n_input": int(om["n_input"]),
                    "min_ts": om.get("min_ts"),
                    "max_ts": om.get("max_ts"),
                }
            )
    return {
        "n_input": n_input,
        "n_late_dropped": dropped,
        "batches": batches,
        "truncated": len(progress) >= cap,  # >= cap: history MAY have been dropped
    }


def sessionized_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (streaming form of W4 sessionization;
    same session_window() as operators/eventwindows.session_window_per_user)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def debounced_stream(stream: DataFrame, gap_us: int | None = None) -> DataFrame:
    """Streaming twin of operators/eventwindows.events_debounce: collapse
    per-(user, event-type) bursts of events separated by ≤ 60 s into one
    row (start, size, decimal-exact value total).

    The batch operator starts a new burst when the gap STRICTLY exceeds
    DEBOUNCE_US; session_window extends a session while the gap is
    strictly LESS than its duration — so the streaming gap is
    DEBOUNCE_US + 1 µs, making both forms break exactly at gap > 60 s.
    Burst identity differs by representation only (batch: running burst_id
    per key; here: the session window itself), so parity compares on
    (user_id, event_type, burst_start, burst_n, burst_value)."""
    from ..operators._util import DEC
    from ..operators.eventwindows import DEBOUNCE_US

    gap = f"{(DEBOUNCE_US if gap_us is None else gap_us) + 1} microseconds"
    sessions = (
        stream.filter(F.col("ts").isNotNull())
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            F.col("user_id"),
            F.col("event_type"),
        )
        .agg(
            F.min("ts").alias("burst_start"),
            F.count("*").alias("burst_n"),
            F.coalesce(
                F.sum(F.col("value").cast(DEC)).cast("double"), F.lit(0.0)
            ).alias("burst_value"),
        )
        .select(
            "user_id", "event_type", "burst_start", "burst_n", "burst_value"
        )
    )
    # NULL-ts events: the batch operator's lag() gap test sees a NULL
    # previous-timestamp for every NULL-ts row (they sort NULLS FIRST),
    # so EACH becomes its own singleton burst — but session_window simply
    # drops NULL timestamps, silently losing those rows. Re-derive the
    # singletons as a second streaming AGGREGATION (not a stateless
    # union branch: complete mode re-emits only what lives in state, so
    # a stateless branch would drop earlier micro-batches' rows at the
    # sink truncate): count duplicates per full row identity, then
    # re-explode count rows — n identical singleton bursts, exactly as
    # the batch form emits them.
    null_ts = (
        stream.filter(F.col("ts").isNull())
        .groupBy("user_id", "event_type", "event_id", "value")
        .agg(F.count("*").alias("n_dup"))
        .select(
            "user_id",
            "event_type",
            F.lit(None).cast("timestamp").alias("burst_start"),
            F.lit(1).cast("long").alias("burst_n"),
            F.coalesce(F.col("value").cast(DEC).cast("double"), F.lit(0.0)).alias(
                "burst_value"
            ),
            F.explode(F.expr("sequence(1, n_dup)")).alias("_dup_i"),
        )
        .drop("_dup_i")
    )
    return sessions.unionByName(null_ts)


def markov_pairs_stream(stream: DataFrame) -> DataFrame:
    """Streaming half of operators/eventwindows.events_markov_transitions:
    emit one row per observed within-user (prev_type → next_type)
    transition, with each user's LAST event carried across micro-batches
    in GroupState — so a sequence split over many batches chains exactly
    as the batch lag() window chains it. Rows within a batch apply in
    (ts, event_id) order (concat all Arrow chunks, sort once — the
    stateful_funnel chunk-boundary lesson); like the funnel, in-order
    streams reproduce the batch operator exactly, and the count/
    normalize rollup stays a downstream batch aggregation over the
    emitted pairs (one stateful operator per query)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        last_us, last_eid, last_type = (
            state.get if state.exists else (None, None, None)
        )
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        prevs: list[str] = []
        nexts: list[str] = []
        if len(batch):
            # Spark's lag() window orders ts ASC NULLS FIRST; pandas
            # defaults NaT to last, which would re-order a NULL-ts
            # event's transitions relative to the batch operator.
            # event_type as the final key mirrors the batch operator's
            # total order (dirty data ties (ts, event_id) — both NULL —
            # within a user; r12 order-invariance class).
            batch = batch.sort_values(
                ["ts", "event_id", "event_type"], na_position="first"
            )
            for ts, eid, etype in zip(
                batch["ts"], batch["event_id"], batch["event_type"]
            ):
                # normalize pandas string-null spellings (None vs NaN) so
                # the None checks below and the emitted pair rows agree
                if pd.isna(etype):
                    etype = None
                if last_type is not None:
                    prevs.append(last_type)
                    nexts.append(etype)
                # dirty rows carry NULL ts/event_id (NaT/NaN here) —
                # int() on those raises; the state fields are nullable
                last_us = (
                    None if pd.isna(ts) else int(pd.Timestamp(ts).value // 1000)
                )
                last_eid = None if pd.isna(eid) else int(eid)
                last_type = etype
        state.update((last_us, last_eid, last_type))
        if prevs:
            yield pd.DataFrame({"prev_type": prevs, "next_type": nexts})

    # r19 (guide §4.1): ship only the columns the state machine reads —
    # the opaque operator otherwise carries the full event row (incl.
    # `props`) through the state shuffle and the Arrow boundary.
    return stream.select(
        "user_id", "ts", "event_id", "event_type"
    ).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="prev_type STRING, next_type STRING",
        stateStructType="last_us BIGINT, last_eid BIGINT, last_type STRING",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_prefix_stream(stream: DataFrame) -> DataFrame:
    """Streaming half of operators/eventwindows.window_cusum_drift: emit
    one row per event with its position `t` and exact running value
    prefix `prefix_micro` (decimal micro-units) within the per-
    event-type (ts, event_id)-ordered series, the ACCUMULATING-state
    step up from the Markov twin's last-row carry — GroupState holds the
    running (count, sum) pair and chains it across micro-batches.

    The drift score itself needs the series mean μ, which no prefix of
    the stream knows, so — one stateful operator per query, like the
    Markov rollup — the μ join and max|S_t| reduction stay a downstream
    batch aggregation over the emitted prefix table: S_t = prefix_micro
    / 1e6 − t·μ. Exactness: each value's SHORTEST decimal repr is
    quantized to 6 dp HALF_UP (Decimal(repr(v)) — how Spark's
    CAST(double AS DECIMAL(25,6)) rounds; NaN/Inf cast to NULL, counted
    by t but not summed) and accumulated as a plain int; |prefix_micro|
    stays under 2⁵³ for any realistic partition, so the downstream
    double division reproduces the batch operator's decimal→double cast
    bit-for-bit (pinned by test_cusum_prefix_stream_matches_batch)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        t, sum_micro = state.get if state.exists else (0, 0)
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        ts_out, eid_out, t_out, pref_out = [], [], [], []
        if len(batch):
            import math

            # Spark's ORDER BY ts ASC is NULLS FIRST; pandas defaults
            # NaT to last, which would shift position t for every
            # non-null row of a type with a NULL-ts event (event_id
            # secondary order stays stable within the NaT block).
            # value as the final key mirrors the batch operator's total
            # order (dirty data ties (ts, event_id) with different
            # values; r12 order-invariance class). Spark sorts NaN
            # GREATEST while pandas na_position='first' would treat it
            # as a NULL — split the key into (is-NaN flag, NaN-filled
            # value) so NaNs land last like Spark's; true NULL values
            # never reach here (filtered upstream).
            batch = batch.assign(
                _vnan=batch["value"].isna(),
                _vkey=batch["value"].fillna(0.0),
            ).sort_values(
                ["ts", "event_id", "_vnan", "_vkey"], na_position="first"
            )
            micro = Decimal("0.000001")
            for ts, eid, v in zip(batch["ts"], batch["event_id"], batch["value"]):
                t += 1
                fv = float(v)
                # CAST(double AS DECIMAL(25,6)) rounds the SHORTEST
                # decimal representation (Double.toString) HALF_UP —
                # Decimal(repr(fv)), NOT Decimal(fv), whose full binary
                # expansion diverges at half boundaries (the same
                # shortest-repr-vs-binary split _util.round6_det pins
                # cross-engine). NaN/Infinity cast to NULL: skipped by
                # the batch SUM but still counted by its COUNT(*) t.
                if math.isfinite(fv):
                    sum_micro += int(
                        Decimal(repr(fv)).quantize(micro, rounding=ROUND_HALF_UP)
                        .scaleb(6)
                    )
                ts_out.append(ts)
                # NULL event_id rides through as NULL (int(NaN) raises)
                eid_out.append(None if pd.isna(eid) else int(eid))
                t_out.append(t)
                pref_out.append(sum_micro)
        state.update((t, sum_micro))
        if t_out:
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(t_out),
                    "ts": ts_out,
                    "event_id": eid_out,
                    "t": t_out,
                    "prefix_micro": pref_out,
                }
            )

    return (
        stream.filter(F.col("value").isNotNull())
        # r19 (guide §4.1): narrow the opaque stateful operator's input
        .select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "event_type STRING, ts TIMESTAMP, event_id BIGINT, "
                "t BIGINT, prefix_micro BIGINT"
            ),
            stateStructType="t BIGINT, sum_micro BIGINT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_funnel(stream: DataFrame) -> DataFrame:
    """Streaming form of the batch `events_funnel_steps` operator: a
    per-user view→click→purchase stage machine carried across
    micro-batches in explicit GroupState. Each batch's rows are applied
    in event-time order; transitions only move forward (a click counts
    only strictly after the recorded first view, a purchase only strictly
    after the recorded first click), so the emitted stage is monotone per
    user and — for in-order streams — equals the batch operator's
    funnel_stage. Timestamps live in state as epoch micros (plain
    bigints survive state serialization everywhere). Out-of-order
    arrivals older than a recorded step are ignored, matching
    first-occurrence semantics; production hardening would add an
    event-time timeout to expire idle users.

    NULL-ts views (round-17 hostile-twin find, nullheavy/compound
    fixtures): the batch operator's `views` aggregation emits a group
    row for a user whose ONLY views carry NULL ts (min() over all-NULL
    is NULL but the row exists) — funnel_stage 1, with clicks forever
    blocked by the ts > NULL comparison. The stream used to skip
    NULL-ts rows entirely and emit NOTHING for such users; it now
    records a null_view flag in state so "viewed, time unknown" is
    stage 1 here too, while NULL-ts clicks/purchases stay ignored on
    both sides (they can never satisfy the strictly-after rule)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        view_us, click_us, purchase_us, null_view = (
            state.get if state.exists else (None, None, None, 0)
        )
        # a group's rows arrive as MULTIPLE Arrow chunks in arbitrary
        # order (split at arrow.maxRecordsPerBatch) — sorting each chunk
        # alone would apply events out of event-time order across chunk
        # boundaries and understate the stage; concat first, sort once
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"], na_position="first")
            for ts, etype in zip(batch["ts"], batch["event_type"]):
                # batch funnel ignores NULL-ts rows entirely (min()
                # skips NULLs; ts > step_ts is NULL -> filtered), and
                # pd.Timestamp(NaT).value is int64-min, which would
                # otherwise become a bogus "earliest" step time
                if pd.isna(ts):
                    if etype == "view":
                        null_view = 1  # viewed, time unknown → stage ≥ 1
                    continue
                us = int(pd.Timestamp(ts).value // 1000)
                if etype == "view" and view_us is None:
                    view_us = us
                elif (
                    etype == "click"
                    and click_us is None
                    and view_us is not None
                    and us > view_us
                ):
                    click_us = us
                elif (
                    etype == "purchase"
                    and purchase_us is None
                    and click_us is not None
                    and us > click_us
                ):
                    purchase_us = us
        state.update((view_us, click_us, purchase_us, null_view))
        stage = (
            1 if view_us is not None else 0
        ) + (1 if click_us is not None else 0) + (1 if purchase_us is not None else 0)
        # NB: a NULL bigint grouping key reaches the pandas state
        # machine as NaN, not Python None — test with pd.isna
        if pd.isna(key[0]) and stage > 1:
            # the batch twin chains its stages with user_id EQUALITY
            # joins, and NULL never equality-joins: a click cannot be
            # attributed to an unidentified user's view, so the NULL-key
            # group's funnel caps at the view row — stage 1 (round-17
            # hostile-twin find #2, nullheavy/compound fixtures)
            stage = 1
        if view_us is not None:
            yield pd.DataFrame(
                {"user_id": [key[0]], "funnel_stage": [stage]}
            )
        elif null_view:
            # only NULL-ts views so far: the batch twin's group row
            # exists with view_ts NULL → stage 1, never progresses
            yield pd.DataFrame({"user_id": [key[0]], "funnel_stage": [1]})

    # r19 (guide §4.1): narrow the opaque stateful operator's input
    return stream.select(
        "user_id", "ts", "event_id", "event_type"
    ).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, funnel_stage BIGINT",
        stateStructType="view_us BIGINT, click_us BIGINT, purchase_us BIGINT, "
        "null_view BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# outside the generated id domain (gen_scale ids are small non-negative
# longs; hostile fixtures never mint lows near -2^62)
TWS_NULL_KEY_SENTINEL = -(1 << 62)


def transform_with_state_profile(stream: DataFrame) -> DataFrame:
    """Per-user running profile on the Spark-4 transformWithStateInPandas
    API (the successor to applyInPandasWithState): typed state variables
    instead of one opaque tuple — a ValueState for (count, total) and a
    MapState as the seen-event-type set — carried across micro-batches in
    the state store. Emits the refreshed profile row for each user each
    batch. TTL is available per state variable (ttlDurationMs) for
    unbounded key spaces; unset here because the profile is the product.

    Runtime requirements this helper wires up: (1) the state-server
    protocol is protobuf — where the real runtime is absent the
    from-spec shim (streaming/protoshim.py) is shipped to workers; the
    DRIVER-side schema-inference worker additionally needs the shim on
    the JVM's PYTHONPATH, i.e. ensure_protobuf_env() before the session
    is created. (2) transformWithState needs a multi-column-family
    state store: run with spark.sql.streaming.stateStore.providerClass
    = RocksDBStateStoreProvider (the HDFS-backed default raises
    UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES).

    NULL grouping keys route through a non-null sentinel (r19 hostile
    twin find #1): pyspark's TransformWithStateInPandasSerializer
    groups arrow rows with itertools.groupby over raw pandas tuples
    (sql/pandas/serializers.py, generate_data_batches), so a NULL
    bigint key — NaN in pandas — fails NaN != NaN equality and
    explodes the NULL group into ~one group PER ROW; worse, any batch
    containing a NaN flips the whole key column to float64, so other
    users' keys in that batch serialize as floats and land in state
    cells DISJOINT from their int-keyed cells (measured on the
    null-heavy fixture: user 94 reported n_events 4119 vs the batch
    contract's 52). Coalescing to an out-of-domain sentinel keeps the
    key column int64 and total; the processor maps the sentinel back
    to NULL on output, restoring the batch groupBy's NULL-is-one-group
    contract."""
    import pandas as pd

    from .protoshim import ensure_protobuf_runtime

    ensure_protobuf_runtime(stream.sparkSession)
    sentinel = TWS_NULL_KEY_SENTINEL
    stream = stream.withColumn(
        "user_id", F.coalesce(F.col("user_id"), F.lit(sentinel))
    )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")
            self._types = handle.getMapState("types", "t STRING", "seen INT")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for t in pdf["event_type"].unique():
                    # a NULL event_type is not a type: str(None) would
                    # mint a 'None' MapState key and overcount vs the
                    # batch contract's COUNT(DISTINCT event_type), which
                    # skips NULLs (round-18 hostile-twin contract,
                    # tests/test_streaming_parity.py)
                    if pd.isna(t):
                        continue
                    self._types.updateValue((str(t),), (1,))
            self._totals.update((n, total))
            n_types = sum(1 for _ in self._types.keys())
            uid = key[0]
            if uid == TWS_NULL_KEY_SENTINEL:
                uid = None  # sentinel-keyed group IS the NULL-user group
            yield pd.DataFrame(
                {
                    "user_id": pd.array([uid], dtype="Int64"),
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "n_event_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    # r19 (guide §4.1): narrow the opaque stateful operator's input
    return stream.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=(
            "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
            "n_event_types BIGINT"
        ),
        outputMode="Update",
        timeMode="None",
    )
