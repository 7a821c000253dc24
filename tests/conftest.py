from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndl_core_data_pipeline_spark.session import get_spark

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
