"""Pin tests for the ten NULLHEAVY_r15 divergences (round 16).

The r15 escalation probe raised the dirty tier's NULL density from 2%
to 30% and found ten cross-engine semantic gaps that the certified
tiers structurally cannot see (tie-collision probability scales
quadratically with NULL density). Each test here reconstructs the exact
adversarial data shape ON A TINY SYNTHETIC TABLE — both-NULL sort-key
tie groups with differing payloads, NULL identity/blocking keys, an
all-NULL SUM group, a 10-dp decimal-cast half boundary — and pins the
fix: engine == DuckDB oracle on that shape, and where the bug was
arrival-order dependence, engine(permutation A) == engine(reversed).

These shapes do NOT exist in the shipped clean testdata (ids unique,
no NULLs), so without synthetic rows the fixes would only be attested
by the null-heavy sweep artifact; these make the regression check part
of the plain suite.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as contract

from .oracle import run_compare

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()

_SRC = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _fixture_dir(tmp_path, name: str, table: str, tbl: pa.Table) -> str:
    """A full sf-dir whose `table` is replaced by the synthetic rows —
    every other table copied from sf0.001 so load() and duckdb_conn()
    both resolve all views."""
    d = tmp_path / name
    d.mkdir()
    for t in _TABLES:
        shutil.copy(os.path.join(_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    pq.write_table(tbl, d / f"{table}.parquet")
    return str(d)


def _ts(s):
    import datetime

    return None if s is None else datetime.datetime.fromisoformat(s)


def _events_table(rows) -> pa.Table:
    cols = list(zip(*rows))
    return pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array([_ts(v) for v in cols[1]], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )


# the adversarial event stream: user 1 carries a BOTH-NULL (ts,
# event_id) tie group with pairwise-distinct values and types laid down
# in DESCENDING value order (so any engine/oracle that falls back to
# arrival order disagrees with the sorted fix); user 2 carries a real-ts
# tie group with NULL event_ids (the non-NULL-ts tie class)
_EV_ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (None, None, 1, "error", 9.0, None),
    (None, None, 1, "purchase", 7.0, "{}"),
    (None, None, 1, "click", 5.0, None),
    (None, None, 1, "view", 3.0, "{}"),
    (None, None, 1, "click", 1.0, None),
    (10, "2024-01-01T10:00:00", 1, "view", 2.0, "{}"),
    (11, "2024-01-01T10:00:30", 1, "click", 4.0, "{}"),
    (12, "2024-01-01T12:00:00", 1, "purchase", 6.0, "{}"),
    (None, "2024-01-02T09:00:00", 2, "view", 8.0, "{}"),
    (None, "2024-01-02T09:00:00", 2, "purchase", 6.5, "{}"),
    (None, "2024-01-02T09:00:00", 2, "click", 4.5, "{}"),
    (20, "2024-01-02T09:30:00", 2, "error", 1.5, "{}"),
]


@pytest.fixture(scope="module")
def event_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nullheavy_events")
    fwd = _fixture_dir(tmp, "fwd", "events", _events_table(_EV_ROWS))
    rev = _fixture_dir(tmp, "rev", "events", _events_table(_EV_ROWS[::-1]))
    return fwd, rev


def _rows(df):
    return sorted(
        [tuple((c, (v is None, v)) for c, v in r.asDict().items()) for r in df.collect()]
    )


@pytest.mark.parametrize(
    "name",
    [
        "window_rolling_stats",
        "events_debounce",
        "events_pattern_match",
        "scd2_intervals",
        "join_point_in_time_scd2",
        "events_session_paths",
    ],
)
def test_event_tie_groups_oracle_and_order_invariant(spark, event_dirs, name):
    """The window/sequence totality fixes: on both-NULL tie groups with
    differing payloads the engine must (a) match DuckDB and (b) not
    depend on arrival order — pre-fix, (ts, event_id) alone left frame
    membership / burst numbering / change-point selection / string_agg
    order to whichever row arrived first."""
    fwd, rev = event_dirs
    problems = run_compare(spark, name, QUERIES[name], ORACLES[name], fwd)
    assert not problems, problems
    assert _rows(QUERIES[name](spark, fwd)) == _rows(QUERIES[name](spark, rev))


def _orders_table(rows) -> pa.Table:
    cols = list(zip(*rows))
    return pa.table(
        {
            "o_orderkey": pa.array(cols[0], pa.int64()),
            "o_custkey": pa.array(cols[1], pa.int64()),
            "o_orderstatus": pa.array(cols[2], pa.string()),
            "o_totalprice": pa.array(cols[3], pa.float64()),
            "o_orderdate": pa.array([_ts(v) for v in cols[4]], pa.timestamp("us")),
            "o_orderpriority": pa.array(cols[5], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def orders_dirs(tmp_path_factory):
    from ndl_core_data_pipeline_spark.operators.sketches import BK_K

    rows = []
    # bottom-k shape: ONE priority whose NULL-orderkey tie group is
    # bigger than the sample (BK_K), with pairwise-distinct prices —
    # which prices enter the sample decided the pre-fix drift
    for i in range(BK_K + 40):
        rows.append((None, 7, "O", 100.0 + i, "1995-06-01T00:00:00", "1-URGENT"))
    for i in range(20):
        rows.append((1000 + i, 8, "O", 50.0 + i, "1996-06-01T00:00:00", "1-URGENT"))
    # mv shape: custkey 42's prices are ALL NULL across base (<cutoff)
    # and delta (>=cutoff); custkey 43 all-NULL on the base side only;
    # custkey 44 mixes a NULL price with a real one
    rows += [
        (2001, 42, "F", None, "1995-01-01T00:00:00", "2-HIGH"),
        (2002, 42, "F", None, "1997-01-01T00:00:00", "2-HIGH"),
        (2003, 43, "F", None, "1995-01-01T00:00:00", "2-HIGH"),
        (2004, 44, "F", None, "1995-01-01T00:00:00", "2-HIGH"),
        (2005, 44, "F", 123.45, "1997-01-01T00:00:00", "2-HIGH"),
    ]
    tmp = tmp_path_factory.mktemp("nullheavy_orders")
    fwd = _fixture_dir(tmp, "fwd", "orders", _orders_table(rows))
    rev = _fixture_dir(tmp, "rev", "orders", _orders_table(rows[::-1]))
    return fwd, rev


@pytest.mark.parametrize(
    "name",
    [
        "agg_bottomk_sample_quantiles",
        "mv_incremental_agg",
        # the custkey-7 block ties (o_orderdate, NULL o_orderkey) with
        # distinct prices — the running-sum prefix shape the r16
        # null-heavy certification sweep caught after the r15 probe
        # passed it by arrival-order luck
        "window_running_sum",
    ],
)
def test_orders_null_shapes_oracle_and_order_invariant(spark, orders_dirs, name):
    fwd, rev = orders_dirs
    problems = run_compare(spark, name, QUERIES[name], ORACLES[name], fwd)
    assert not problems, problems
    assert _rows(QUERIES[name](spark, fwd)) == _rows(QUERIES[name](spark, rev))


def test_mv_incremental_sum_of_all_null_group_is_null(spark, orders_dirs):
    """SUM over a group with no non-NULL addends is NULL in SQL; the
    incremental merge must not mint 0.0 for it (the one genuine wrong
    answer among the ten — not a tie)."""
    fwd, _ = orders_dirs
    out = {
        r["o_custkey"]: (r["n_orders"], r["total_spend"])
        for r in QUERIES["mv_incremental_agg"](spark, fwd).collect()
        if r["o_custkey"] in (42, 43, 44)
    }
    assert out[42] == (2, None)  # all-NULL across both sides
    assert out[43] == (1, None)  # all-NULL, base side only
    assert out[44][0] == 2 and abs(out[44][1] - 123.45) < 1e-9


def _documents_table(rows) -> pa.Table:
    cols = list(zip(*rows))
    return pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in cols[1]], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def docs_dirs(tmp_path_factory):
    near_dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # NULL-id docs sharing a rare term: the oracle's cross-doc
        # DISTINCT collapsed them into one pseudo-doc (df / n_grams
        # drift) — both engines must now drop NULL ids
        (None, "zzrare common words here today", "en", "src1", None),
        (None, "zzrare common words here today", "en", "src1", None),
        (None, "zzrare another body entirely now", "en", "src2", None),
        (1, "zzrare real doc one body text", "en", "src1", None),
        (2, "plain real doc two body text", "en", "src2", None),
        # NULL-source near-dups: the engine blocks NULL as one real
        # group; the oracle's equi-join dropped the pair
        (3, near_dup, "en", None, None),
        (4, near_dup + " lambda", "en", None, None),
        # eval docs for contamination (source src0)
        (5, "zzrare common words here today", "en", "src0", None),
    ]
    tmp = tmp_path_factory.mktemp("nullheavy_docs")
    fwd = _fixture_dir(tmp, "fwd", "documents", _documents_table(rows))
    rev = _fixture_dir(tmp, "rev", "documents", _documents_table(rows[::-1]))
    return fwd, rev


@pytest.mark.parametrize(
    "name",
    ["search_inverted_postings", "contamination_ngram", "dedup_ngram_jaccard"],
)
def test_docs_null_identity_and_block_keys(spark, docs_dirs, name):
    fwd, rev = docs_dirs
    problems = run_compare(spark, name, QUERIES[name], ORACLES[name], fwd)
    assert not problems, problems
    assert _rows(QUERIES[name](spark, fwd)) == _rows(QUERIES[name](spark, rev))


def test_ngram_jaccard_null_source_block_pairs(spark, docs_dirs):
    """Docs with an unknown source still dedup against each other: the
    NULL block is one real block in BOTH engines (pre-fix the oracle's
    a.source = b.source dropped the pair: spark=1 oracle=0)."""
    fwd, _ = docs_dirs
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, fwd).collect()
    }
    assert (3, 4) in pairs


def test_decimal_cast_half_boundary_needs_preround(spark):
    """Pins the graph_pagerank class: CAST(double AS DECIMAL(27,10))
    rounds the shortest decimal repr in Spark (BigDecimal.valueOf,
    HALF_UP) but the binary expansion in DuckDB — a double whose repr
    ends in 5 at the 11th place casts one ulp apart. The fix idiom
    pre-rounds with floor(x*1e10+0.5)/1e10 (pure IEEE ops, identical in
    both engines); the cast of that k/1e10 double is then exact."""
    import duckdb
    from pyspark.sql import functions as F

    x = 0.00049975945  # repr half at 1e-11; binary value sits below
    row = (
        spark.range(1)
        .select(
            F.lit(x).cast("decimal(27,10)").alias("raw"),
            (F.floor(F.lit(x) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
            .cast("decimal(27,10)")
            .alias("det"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    try:
        duck_raw, duck_det = con.execute(
            f"SELECT CAST(CAST({x!r} AS DOUBLE) AS DECIMAL(27,10)), "
            f"CAST(FLOOR(CAST({x!r} AS DOUBLE) * 10000000000.0 + 0.5) "
            f"/ 10000000000.0 AS DECIMAL(27,10))"
        ).fetchone()
    finally:
        con.close()
    assert str(row["raw"]) != str(duck_raw)  # the divergence class
    # the pre-round follows the BINARY value (x*1e10 sits just below
    # the half), and both engines compute that identical double
    assert str(row["det"]) == str(duck_det) == "0.0004997594"
