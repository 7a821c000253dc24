"""K7 publisher adapter: distributed layout + card, driver-side hub
wrapper mirroring the reference's delete-then-upload sequence."""

from __future__ import annotations

import glob
import json
import os

from ndl_core_data_pipeline_spark import publish


def test_prepare_dataset_layout_and_card(spark, tmp_path):
    rows = [
        (f"{h}{i:031x}", f"src{i % 2}", f"text {i}") for i, h in enumerate("abcd")
    ]
    df = spark.createDataFrame(rows, "identifier STRING, source STRING, text STRING")
    out = str(tmp_path / "ds")
    status = publish.prepare_dataset(df, out, "my-dataset")
    assert status["n_rows"] == 4
    shards = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "shard=*"))
    )
    assert shards == ["shard=a0", "shard=b0", "shard=c0", "shard=d0"]
    card = open(os.path.join(out, "README.md")).read()
    assert card.startswith("---")  # YAML front-matter
    assert "# my-dataset" in card and "Rows: 4" in card
    assert "| src0 | 2 |" in card and "| src1 | 2 |" in card
    meta = json.load(open(os.path.join(out, ".publish.json")))
    assert meta["name"] == "my-dataset" and meta["n_rows"] == 4


def test_publish_folder_clears_then_uploads(tmp_path):
    calls = []

    class FakeApi:
        def list_repo_files(self, repo_id, repo_type):
            return ["README.md", ".gitattributes", "shard=aa/x.parquet", "old.json"]

        def delete_files(self, repo_id, repo_type, delete_patterns, commit_message):
            calls.append(("delete", sorted(delete_patterns)))

        def upload_folder(self, folder_path, repo_id, repo_type, commit_message, **kw):
            calls.append(("upload", folder_path, repo_id))

    ok = publish.publish_folder(str(tmp_path), "org/ds", api=FakeApi())
    assert ok
    # card files kept, data files cleared — then one folder upload
    assert calls == [
        ("delete", ["old.json", "shard=aa/x.parquet"]),
        ("upload", str(tmp_path), "org/ds"),
    ]


def test_publish_folder_without_hub_lib(tmp_path):
    # huggingface_hub absent in this container: gated, not an error
    assert publish.publish_folder(str(tmp_path), "org/ds") is False


def test_delete_patterns_escape_glob_metacharacters():
    calls = []

    class FakeApi:
        def list_repo_files(self, repo_id, repo_type):
            return ["README.md", "data[2024].json", "report?.csv"]

        def delete_files(self, repo_id, repo_type, delete_patterns, commit_message):
            calls.append(sorted(delete_patterns))

    publish.delete_all_except_readme(FakeApi(), "org/ds")
    # literal names escaped so fnmatch treats them exactly
    assert calls == [["data[[]2024].json", "report[?].csv"]]
