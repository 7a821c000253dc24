"""CLI surface: list / query / pipeline subcommands."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndl_core_data_pipeline_spark.__main__ import main


def test_list_prints_all_queries(capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 100


def test_query_runs_and_shows(spark, sf_small, capsys):
    assert main(["query", "agg_count_by_key", "--sf-dir", sf_small], spark=spark) == 0
    out = capsys.readouterr().out
    assert "event_type" in out and "cnt" in out


def test_query_unknown_name_errors(spark, capsys):
    assert main(["query", "no_such_query"], spark=spark) == 2
    assert "unknown query" in capsys.readouterr().err


def test_pipeline_end_to_end(spark, tmp_path):
    raw = spark.createDataFrame(
        [
            ("Doc A", "src1", "text", "alpha beta gamma " * 20, "2024-01-02"),
            ("Doc A dup", "src1", "text", "alpha beta gamma " * 20, "2024-01-03"),
            ("Doc B", "src2", "text", "delta epsilon zeta " * 20, "2024-01-04"),
        ],
        ["title", "source", "format", "text", "date"],
    )
    inp, outp = str(tmp_path / "raw"), str(tmp_path / "out")
    raw.write.parquet(inp)
    assert main(["pipeline", "--input", inp, "--output", outp], spark=spark) == 0
    got = spark.read.parquet(outp)
    # dedup collapsed the duplicate text; canonical schema present
    assert got.count() == 2
    assert "identifier" in got.columns and "word_count" in got.columns
    assert got.filter(F.col("language").isNull()).count() == 0


def test_cli_compact(spark, tmp_path):
    import glob

    from ndl_core_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "frag")
    spark.range(0, 2000).repartition(25).write.parquet(src)
    out = str(tmp_path / "packed")
    rc = main(
        ["compact", "--input", src, "--output", out, "--target-mb", "64"],
        spark=spark,
    )
    assert rc == 0
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 2000


def test_cli_zorder(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.range(2000).select(
        (F.col("id") % 50).alias("a"), ((F.col("id") * 7) % 100).alias("b")
    ).write.parquet(src)
    out = str(tmp_path / "z")
    assert (
        main(
            ["zorder", "--input", src, "--output", out, "--cols", "a,b",
             "--files", "4"],
            spark=spark,
        )
        == 0
    )
    printed = capsys.readouterr().out
    assert "wrote 4 z-ordered files" in printed
    back = spark.read.parquet(out)
    assert back.count() == 2000


def test_profile_command(spark, sf_small, tmp_path, capsys):
    from ndl_core_data_pipeline_spark.io import load

    inp = str(tmp_path / "orders_pq")
    load(spark, sf_small, "orders").write.parquet(inp)
    assert (
        main(
            ["profile", "--input", inp, "--cols", "o_orderstatus,o_orderpriority"],
            spark=spark,
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "o_orderstatus: rows=" in out and "entropy=" in out
    assert "o_orderpriority" in out


def test_profile_unknown_column_errors(spark, sf_small, tmp_path, capsys):
    from ndl_core_data_pipeline_spark.io import load

    inp = str(tmp_path / "o2")
    load(spark, sf_small, "orders").select("o_orderkey").write.parquet(inp)
    assert main(["profile", "--input", inp, "--cols", "nope"], spark=spark) == 2
    assert "unknown columns" in capsys.readouterr().err


def test_extract_command_markdown(spark, tmp_path, capsys):
    d = tmp_path / "md"
    d.mkdir()
    (d / "a.md").write_text("---\ntitle: A\n---\nHello extraction")
    outp = str(tmp_path / "out_pq")
    assert (
        main(
            ["extract", "--kind", "markdown", "--input", str(d), "--output", outp],
            spark=spark,
        )
        == 0
    )
    assert "extracted 1 rows" in capsys.readouterr().out
    back = spark.read.parquet(outp).collect()
    assert back[0]["text"] == "Hello extraction"
