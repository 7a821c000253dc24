"""Command-line entry point — the engine's analog of the reference's
Dagster job surface (definitions.py): every registered query and the
refinement pipeline runnable offline from a shell.

    python -m ndl_core_data_pipeline_spark list
    python -m ndl_core_data_pipeline_spark query q1_pricing_summary \
        --sf-dir /root/testdata/sf0.001 --show 10
    python -m ndl_core_data_pipeline_spark pipeline \
        --input raw.parquet --output out_dir [--publish-name my-dataset]

`pipeline` runs the §3.1 chain (canonicalize → dedup → filter →
anonymize); with --publish-name the output is laid out as a publishable
UUID-sharded dataset folder (publish.prepare_dataset), else plain
parquet."""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ndl_core_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    qp = sub.add_parser("query", help="run a registered query and show rows")
    qp.add_argument("name")
    qp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="table directory (default: $SPARK_GRAFT_SF_DIR, same knob as bench.py)",
    )
    qp.add_argument("--show", type=int, default=20)
    pp = sub.add_parser("pipeline", help="run the refinement pipeline")
    pp.add_argument("--input", required=True, help="raw records parquet path")
    pp.add_argument("--output", required=True, help="output directory")
    pp.add_argument(
        "--publish-name",
        default=None,
        help="lay the output out as a publishable sharded dataset folder",
    )
    cp = sub.add_parser(
        "compact", help="rewrite a fragmented parquet dir into right-sized files"
    )
    cp.add_argument("--input", required=True, help="fragmented parquet directory")
    cp.add_argument("--output", required=True, help="compacted output directory")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.add_argument(
        "--sort-col", default=None, help="range-cluster output on this column"
    )
    zp = sub.add_parser(
        "zorder",
        help="rewrite a parquet dir clustered on a 2-D Morton key "
        "(OPTIMIZE ZORDER BY analog; cols should be small non-negative "
        "ints — pre-bucket wide domains)",
    )
    zp.add_argument("--input", required=True, help="input parquet directory")
    zp.add_argument("--output", required=True, help="clustered output directory")
    zp.add_argument(
        "--cols", required=True, help="two numeric columns, comma-separated"
    )
    zp.add_argument("--files", type=int, default=16, help="output file count")
    fp = sub.add_parser(
        "profile",
        help="long-form column profile (rows/nulls/ndv/entropy) of a "
        "parquet directory",
    )
    fp.add_argument("--input", required=True, help="parquet directory")
    fp.add_argument(
        "--cols",
        default=None,
        help="comma-separated columns (default: every non-binary column)",
    )
    ep = sub.add_parser(
        "extract",
        help="distributed text extraction over a document directory "
        "-> parquet",
    )
    ep.add_argument(
        "--kind",
        required=True,
        choices=["pdf", "docx", "markdown", "workbook", "zip"],
    )
    ep.add_argument("--input", required=True, help="document directory")
    ep.add_argument("--output", required=True, help="output parquet directory")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    from .contract import build_registry

    reg = build_registry()
    if args.cmd == "list":
        for name in reg.queries:
            print(name)
        return 0
    # name check happens before the (expensive) SparkSession spin-up
    if args.cmd == "query" and args.name not in reg.queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2

    owns_session = spark is None
    if owns_session:
        from .session import get_spark

        spark = get_spark(app_name="ndlspark-cli")
    try:
        if args.cmd == "query":
            reg.queries[args.name](spark, args.sf_dir).show(
                args.show, truncate=False
            )
        elif args.cmd == "pipeline":
            from .pipeline import process

            raw = spark.read.parquet(args.input)
            out = process(raw)
            if args.publish_name:
                from .publish import prepare_dataset

                prepare_dataset(out, args.output, args.publish_name)
            else:
                out.write.mode("overwrite").parquet(args.output)
        elif args.cmd == "compact":
            from .sinks import compact_parquet

            stats = compact_parquet(
                spark,
                args.input,
                args.output,
                target_file_bytes=args.target_mb * 1024 * 1024,
                sort_col=args.sort_col,
            )
            print(
                f"compacted {stats['n_files_in']} files "
                f"({stats['bytes_in']} bytes) -> {stats['n_files_out']}"
            )
        elif args.cmd == "profile":
            from .operators.warehouse import profile_columns

            df = spark.read.parquet(args.input)
            if args.cols:
                cols = [c.strip() for c in args.cols.split(",")]
                missing = [c for c in cols if c not in df.columns]
                if missing:
                    print(f"unknown columns: {missing}", file=sys.stderr)
                    return 2
            else:
                cols = [
                    f.name
                    for f in df.schema.fields
                    if f.dataType.simpleString() != "binary"
                ]
            if not cols:
                print("no profilable (non-binary) columns", file=sys.stderr)
                return 2
            # backtick-quote so dotted names resolve literally (both
            # F.col and plain df[c] parse dots as nested-field paths)
            prof = profile_columns(
                df,
                {
                    c: df["`" + c.replace("`", "``") + "`"].cast("string")
                    for c in cols
                },
            )
            for r in prof.collect():
                print(
                    f"{r['column_name']}: rows={r['n_rows']} "
                    f"nulls={r['n_null']} ndv={r['n_distinct']} "
                    f"entropy={r['entropy_nats']}"
                )
        elif args.cmd == "extract":
            scans = {
                "pdf": "ndl_core_data_pipeline_spark.sources.pdfs:scan_pdfs",
                "docx": "ndl_core_data_pipeline_spark.sources.docx:scan_docx",
                "markdown": (
                    "ndl_core_data_pipeline_spark.sources.markdown:scan_markdown"
                ),
                "workbook": (
                    "ndl_core_data_pipeline_spark.sources.spreadsheet"
                    ":scan_workbooks"
                ),
                "zip": (
                    "ndl_core_data_pipeline_spark.sources.archives"
                    ":scan_zip_tables"
                ),
            }
            import importlib

            mod_name, fn_name = scans[args.kind].split(":")
            scan = getattr(importlib.import_module(mod_name), fn_name)
            out = scan(spark, args.input)
            out.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            print(f"extracted {n} rows from {args.kind} corpus -> {args.output}")
        elif args.cmd == "zorder":
            from pyspark.sql import functions as F

            from .operators.warehouse import _spread16_sql
            from .sinks import file_zone_maps, write_zordered

            a, b = [c.strip() for c in args.cols.split(",")]
            z = F.expr(f"({_spread16_sql(a)} | ({_spread16_sql(b)} << 1))")
            df = spark.read.parquet(args.input)
            write_zordered(df, args.output, z, args.files)
            zm = file_zone_maps(spark, args.output, [a, b]).collect()
            print(f"wrote {len(zm)} z-ordered files; zone maps:")
            for r in sorted(zm, key=lambda r: r["file"]):
                print(
                    f"  {os.path.basename(r['file'])}: n={r['n_rows']} "
                    f"{a}=[{r[f'min_{a}']},{r[f'max_{a}']}] "
                    f"{b}=[{r[f'min_{b}']},{r[f'max_{b}']}]"
                )
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
