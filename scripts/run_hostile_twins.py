#!/usr/bin/env python
"""Run the batch≡stream hostile-twin pytest battery and record the
certify checkpoint (.scale/hostile_twins.json) with the engine tree
stamp — replacing the hand-run save_results snippet the r17 close used.

Round 18 widened the matrix: tumbling/session/funnel PLUS stream_dedup,
stateful_running_totals and stream_stream_join over
clean/nullheavy/compound/duprow/duprow_compound, alongside the
debounce/markov/cusum twin pins. Round 19 lifts the last gate:
transform_with_state_profile runs all five fixture tiers via the
from-spec protobuf shim (streaming/protoshim.py) — every stateful job
is now hostile-fixture-certified with no environment annotation.

Usage: python scripts/run_hostile_twins.py [--out .scale/hostile_twins.json]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from _sweeplib import save_results  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/hostile_twins.json")
    args = ap.parse_args()

    env = dict(os.environ)
    env["SPARK_GRAFT_HOSTILE_TWINS"] = "1"
    env["SPARK_GRAFT_NULLS_SWEEP"] = "1"
    cmd = [
        sys.executable, "-m", "pytest", "-q",
        "tests/test_streaming_parity.py",
        "tests/test_streaming.py", "-k", "matches_batch",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    tail = (p.stdout + p.stderr).strip().splitlines()
    detail = tail[-1] if tail else ""
    m = re.search(r"(\d+) passed", detail)
    failed = re.search(r"(\d+) (?:failed|error)", detail)
    ok = p.returncode == 0 and m is not None and failed is None
    save_results(
        os.path.join(REPO, args.out),
        {
            "hostile_twins": {
                "ok": ok,
                "detail": detail,
                "tests": (
                    "test_streaming_parity.py (tumbling/session/funnel/"
                    "dedup/running-totals/stream-stream-join/"
                    "transformWithState-profile x clean/nullheavy/"
                    "compound/duprow/duprow_compound; protobuf via "
                    "from-spec shim where the real runtime is absent) + "
                    "debounce/markov/cusum twins x clean/dirty/nullheavy/"
                    "compound/duprow/duprow_compound"
                ),
                "env": "SPARK_GRAFT_HOSTILE_TWINS=1 SPARK_GRAFT_NULLS_SWEEP=1",
            }
        },
    )
    print(detail)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
