from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark
from ndl_core_data_pipeline_spark.streaming.protoshim import (
    ensure_protobuf_env,
)

# transformWithStateInPandas spawns a DRIVER-side python worker whose
# sys.path comes from the JVM's PYTHONPATH env var — addPyFile never
# reaches it. Exporting the shim path here, at conftest import (before
# any SparkSession and therefore before the JVM starts), covers every
# python process the JVM will launch. No-op when the real protobuf
# runtime is installed.
ensure_protobuf_env()

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MEDIUM = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark(app_name="ndlspark-tests", cpus=cpus, shuffle_partitions=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM


# NULL/NaN/''-injected copy of every driver table (scripts/gen_scale.py
# --nulls). Shared by the registry-wide dirty sweep (test_nulls_parity)
# and the streaming-twin dirty runs (test_streaming) so both tiers read
# the SAME dataset. Built on first use; survives across runs on disk.
NULLS_DIR = os.environ.get(
    "SPARK_GRAFT_NULLS_SF_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scale", "nulls0.01"),
)


def ensure_dirty_dataset() -> str:
    if not os.path.exists(os.path.join(NULLS_DIR, "MANIFEST.json")):
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
        )
        from gen_scale import inject_nulls

        # clean source configurable (ADVICE r11: a hardcoded absolute
        # path blocked running the sweep with testdata elsewhere)
        base = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
        inject_nulls(base, NULLS_DIR)
    return NULLS_DIR


# Round-17 (verdict item 5): the batch≡stream twin-equality pins run on
# the three hostile fixtures that found the last 30 batch bugs —
# null-heavy (30% NULL, seed 7121), compound (hotkey 50% → unicode 5% →
# nulls 30%), and duplicate-row (30% payload-identical rows, fresh ids).
# Each builds once via its sweep's own ensure function (same recipe +
# manifest staleness rules as the registry sweeps) so twins and batch
# sweeps read the SAME bytes.
def ensure_hostile_dataset(kind: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    base = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.01")
    root = os.path.join(repo, ".scale")
    if kind == "nullheavy":
        from nullheavy_sweep import ensure_nullheavy_dataset

        d = os.path.join(root, "nullheavy0.01")
        ensure_nullheavy_dataset(base, d)
    elif kind == "compound":
        from compound_sweep import ensure_compound_dataset

        d = os.path.join(root, "compound0.01")
        ensure_compound_dataset(base, d)
    elif kind == "duprow":
        from duprow_sweep import ensure_duprow_dataset

        d = os.path.join(root, "duprow0.01")
        ensure_duprow_dataset(base, d)
    elif kind == "duprow_compound":
        from duprow_compound_sweep import ensure_duprow_compound_dataset

        d = os.path.join(root, "duprow_compound0.01")
        ensure_duprow_compound_dataset(base, d)
    else:
        raise ValueError(f"unknown hostile fixture kind {kind!r}")
    return d
