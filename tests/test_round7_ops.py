"""Round-7 operator tests: degree-oriented triangle counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark.operators import graphs


def _counts(df):
    row = df.collect()[0]
    return row["n_edges"], row["n_triangles"]


def test_oriented_equals_naive_on_testdata(spark, sf_small):
    e = graphs._affinity_edges(spark, sf_small)
    assert _counts(graphs._triangle_count_from_edges(e)) == _counts(
        graphs._triangle_count_naive(e)
    )


def test_oriented_triangles_on_skewed_star(spark):
    """A hub star — the shape where naive wedge joins blow up to degree²
    rows on one key — plus known triangles. Hub 0 connects to 1..40;
    triangles are exactly the closed fans (0,1,2), (0,3,4) and the
    hub-free (100,101,102)."""
    edges = (
        [(0, k) for k in range(1, 41)]
        + [(1, 2), (3, 4)]
        + [(100, 101), (100, 102), (101, 102)]
    )
    e = spark.createDataFrame(edges, "part_a bigint, part_b bigint")
    n_edges, n_tri = _counts(graphs._triangle_count_from_edges(e))
    assert n_edges == 45
    assert n_tri == 3
    assert _counts(graphs._triangle_count_naive(e)) == (45, 3)


def test_oriented_handles_rank_ties(spark):
    """All-equal degrees (a 4-cycle plus one chord = two triangles) force
    the (degree, id) tie-break path."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)],
        "part_a bigint, part_b bigint",
    )
    assert _counts(graphs._triangle_count_from_edges(e)) == (5, 2)


def test_tree_depth_closed_form_sparse_keys(spark, sf_small, tmp_path):
    """Round-6 ADVICE: the old doubling join dropped nodes whose heap
    ancestors were filtered out of part. The closed form is per-row
    arithmetic — a sparse part table keeps every node, with depths
    matching the recursive definition."""
    from ndl_core_data_pipeline_spark.io import load

    sparse_dir = tmp_path / "sparse"
    sparse_dir.mkdir()
    # keep only odd keys: parents (even keys) are absent from the table
    load(spark, sf_small, "part").filter(
        F.col("p_partkey") % 2 == 1
    ).write.parquet(str(sparse_dir / "part.parquet"))
    out = {
        r["p_partkey"]: (r["depth"], r["top_branch"])
        for r in graphs.graph_tree_depth_root(spark, str(sparse_dir)).collect()
    }
    expected_nodes = {
        r["p_partkey"]
        for r in load(spark, str(sparse_dir), "part").collect()
    }
    assert set(out) == expected_nodes  # nothing silently dropped

    def ref(k):
        d, br = 0, 0
        while k > 0:
            br = k if k in (1, 2) else br
            k = (k - 1) // 2
            d += 1
        return d, br

    for k, got in out.items():
        assert got == ref(k), f"node {k}: {got} != {ref(k)}"


def test_tree_depth_over_edges_sparse_ids(spark):
    """General pointer doubling over an explicit parent table with
    non-contiguous ids and two roots."""
    edges = spark.createDataFrame(
        [
            (10, 10),  # root A
            (20, 10),
            (30, 20),
            (99, 30),
            (500, 10),
            (7000, 7000),  # root B
            (8000, 7000),
        ],
        "node bigint, parent bigint",
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in graphs.tree_depth_over_edges(edges, rounds=3).collect()
    }
    assert got == {
        10: (10, 0),
        20: (10, 1),
        30: (10, 2),
        99: (10, 3),
        500: (10, 1),
        7000: (7000, 0),
        8000: (7000, 1),
    }


def test_mad_approx_tier_matches_exact_fences(spark, sf_small):
    """The approx scale tier's per-group med/MAD fences agree with the
    exact form within the sketch's rank-error budget at test scale (a
    GK sketch with acc=10k on a few thousand rows is near-exact)."""
    from ndl_core_data_pipeline_spark.operators import filters

    exact = {
        r["event_type"]: (r["med"], r["mad"])
        for r in filters.mad_outliers(spark, sf_small)
        .select("event_type", "med", "mad")
        .distinct()
        .collect()
    }
    approx = {
        r["event_type"]: (r["med"], r["mad"])
        for r in filters.mad_outliers_approx(spark, sf_small)
        .select("event_type", "med", "mad")
        .distinct()
        .collect()
    }
    assert set(approx) == set(exact)
    for et, (med_a, mad_a) in approx.items():
        med_e, mad_e = exact[et]
        assert abs(med_a - med_e) <= 0.05 * max(abs(med_e), 1.0)
        assert abs(mad_a - mad_e) <= 0.05 * max(abs(mad_e), 1.0)


def test_oriented_wedge_groups_by_low_rank_source(spark):
    """Structural pin: after orientation every out-edge of the hub points
    AWAY from it only toward higher-rank vertices, so the hub (highest
    degree) has out-degree 0 — the property that bounds wedge work."""
    edges = [(0, k) for k in range(1, 21)] + [(1, 2)]
    e = spark.createDataFrame(edges, "part_a bigint, part_b bigint")
    deg = (
        e.select(F.col("part_a").alias("v"))
        .unionAll(e.select(F.col("part_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    hub = deg.orderBy(F.desc("deg")).first()["v"]
    assert hub == 0
    # reproduce the orientation step and check hub out-degree
    ranked = (
        e.join(deg.withColumnRenamed("v", "part_a"), "part_a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.withColumnRenamed("v", "part_b").withColumnRenamed(
                "deg", "deg_b"
            ),
            "part_b",
        )
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("part_a") < F.col("part_b"))
    )
    src = F.when(a_first, F.col("part_a")).otherwise(F.col("part_b"))
    out_deg_hub = ranked.filter(src == hub).count()
    assert out_deg_hub == 0
