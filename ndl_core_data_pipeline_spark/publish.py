"""K7 publisher adapter (SURVEY §2.2) — dataset publication split
Spark-first (ref: assets/processing/hugginface_structured_uploader.py,
assets/rag/hugginface_uploader.py).

The reference's uploaders are thin driver-side HfApi wrappers around a
pre-built local folder; the actual work — laying the dataset out under
the hub's 10,000-files-per-directory limit and describing it — happens
before upload. Here that split is explicit:

- prepare_dataset(): DISTRIBUTED — UUID-prefix-sharded parquet layout
  (256 `shard=xx` dirs, sinks.write_uuid_sharded) plus a dataset card
  whose stats come from the same write job's observe() metrics and one
  small aggregation (per-source row counts — a GROUP BY over a
  low-cardinality key, driver receives only the summary rows).
- publish_folder(): DRIVER-SIDE, import-gated on huggingface_hub —
  mirrors the reference's delete-all-except-README + upload_folder
  sequence (hugginface_structured_uploader.py:12-57). Without the hub
  library the prepared folder is still complete and publishable by any
  other transport.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, functions as F

from .sinks import write_uuid_sharded

KEEP_FILES = ("README.md", ".gitattributes", ".gitignore")  # uploader:20


def dataset_card(name: str, status: dict, source_counts: list[tuple[str, int]]) -> str:
    """README.md dataset card: YAML front-matter + stats table."""
    lines = [
        "---",
        "license: ogl-uk-3.0",
        "configs:",
        "- config_name: default",
        "  data_files:",
        '  - split: train',
        '    path: "shard=*/*.parquet"',
        "---",
        f"# {name}",
        "",
        f"Rows: {status.get('n_rows', 0)}; shards: {status.get('n_partitions', 0)}.",
        "",
    ]
    if source_counts:
        lines += ["| source | rows |", "|---|---|"]
        lines += [f"| {s} | {n} |" for s, n in source_counts]
        lines.append("")
    return "\n".join(lines)


def prepare_dataset(
    df: DataFrame,
    out_dir: str,
    name: str,
    source_col: str | None = "source",
) -> dict:
    """Write the publishable folder: sharded parquet + README.md card.
    Returns the write status dict (row/shard counts)."""
    status = write_uuid_sharded(df, out_dir)
    source_counts: list[tuple[str, int]] = []
    if source_col and source_col in df.columns:
        # aggregate over the parquet just WRITTEN, not the input plan: the
        # card then always describes the published bytes (a nondeterministic
        # lineage — uuid ids, sampling — would diverge on recompute) and the
        # upstream DAG isn't paid a second time
        written = df.sparkSession.read.parquet(out_dir)
        source_counts = [
            (r[source_col], r["n"])
            for r in written.groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), source_col)
            .collect()  # low-cardinality summary only
        ]
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(dataset_card(name, status, source_counts))
    with open(os.path.join(out_dir, ".publish.json"), "w") as f:
        json.dump({"name": name, **{k: int(v) for k, v in status.items()}}, f)
    return status


def delete_all_except_readme(api, repo_id: str) -> list[str]:
    """Clear the hub dataset except the card files, exactly as the
    reference does before re-upload (uploader:12-36)."""
    repo_files = api.list_repo_files(repo_id=repo_id, repo_type="dataset")
    to_delete = [f for f in repo_files if f not in KEEP_FILES]
    if to_delete:
        # delete_patterns are fnmatch globs: escape literal filenames so a
        # repo file named 'data[2024].json' matches exactly, not as a glob
        api.delete_files(
            repo_id=repo_id,
            repo_type="dataset",
            delete_patterns=[glob.escape(f) for f in to_delete],
            commit_message="Delete all files except README.md before re-upload",
        )
    return to_delete


def publish_folder(
    folder: str,
    repo_id: str,
    path_in_repo: str | None = None,
    clear_first: bool = True,
    api=None,
) -> bool:
    """Upload a prepared folder to a hub dataset repo. Import-gated:
    returns False (folder stays local) when huggingface_hub is absent.
    `api` is injectable for tests."""
    if api is None:
        try:
            from huggingface_hub import HfApi
        except ImportError:
            return False
        api = HfApi()
    if clear_first:
        delete_all_except_readme(api, repo_id)
    kwargs = {"path_in_repo": path_in_repo} if path_in_repo else {}
    api.upload_folder(
        folder_path=folder,
        repo_id=repo_id,
        repo_type="dataset",
        commit_message="Upload dataset files",
        **kwargs,
    )
    return True
