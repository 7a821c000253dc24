#!/usr/bin/env python
"""Round-15 close: roll the sweep checkpoints into the committed
artifacts (SWEEPS_r15.json summary + per-axis copies), refusing any
checkpoint whose tree stamp is not the current engine tree."""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from _sweeplib import META_KEY, engine_tree_hash  # noqa: E402

# (checkpoint, committed name, fixture dir whose MANIFEST identifies
# the data the results were computed on — an all-green skew map and an
# all-green nonfinite map are otherwise byte-identical)
COPIES = {
    ".scale/config_sweep.json": ("CONFIG_r15.json", None),
    ".scale/asym_empty_sweep.json": ("ASYM_r15.json", None),
    ".scale/unicode_sweep.json": ("UNICODE_r15.json", ".scale/unicode0.01"),
    ".scale/skew_sweep.json": ("SKEW_r15.json", ".scale/hotkey0.01"),
    ".scale/nonfinite_sweep.json": ("NONFINITE_r15.json", ".scale/nonfinite0.01"),
    ".scale/forced_distributed_sweep.json": ("FORCEDDIST_r15.json", None),
}

CHECKS = {
    "empty-input totality": ".scale/empty_sweep.json",
    "asym-empty": ".scale/asym_empty_sweep.json",
    "dirty A": ".scale/nulls_sweep.json",
    "dirty B": ".scale/nulls_sweep_b.json",
    "order A": ".scale/order_sweep.json",
    "order B": ".scale/order_sweep_b.json",
    "width": ".scale/width_sweep.json",
    "config": ".scale/config_sweep.json",
    "unicode": ".scale/unicode_sweep.json",
    "skew": ".scale/skew_sweep.json",
    "nonfinite": ".scale/nonfinite_sweep.json",
    "forced-distributed": ".scale/forced_distributed_sweep.json",
    "stability": ".scale/oracle_stability.json",
}


def count(path: str, tree: str) -> str:
    with open(os.path.join(REPO, path)) as fh:
        data = json.load(fh)
    meta = data.pop(META_KEY, None)
    if not isinstance(meta, dict) or meta.get("tree") != tree:
        return "STALE"
    if "config" in path or "asym" in path:
        tot = ok = 0
        for outer, res in data.items():
            if outer.startswith("_"):
                continue
            tot += len(res)
            ok += sum(1 for r in res.values() if r.get("ok"))
        return f"{ok}/{tot}"
    if "stability" in path:
        ok = sum(1 for r in data.values() if r.get("stable", r.get("ok")))
        return f"{ok}/{len(data)}"
    ok = sum(1 for r in data.values() if r.get("ok"))
    return f"{ok}/{len(data)}"


def main() -> None:
    tree = engine_tree_hash()
    summary = {
        "round": 15,
        "note": (
            "Full re-execution of every standing sweep on the round-15 "
            "tree, now THIRTEEN checkpoints across eleven axes: the nine "
            "r14 axes plus hot-key skew, non-finite doubles (NaN/±Inf/"
            "-0.0), and forced-distributed oracle attestation of the "
            "size-adaptive operators' large-scale branches. All "
            "checkpoints engine-tree-stamped on the frozen close tree."
        ),
        "tree": tree[:16],
        "results": {},
    }
    bad = []
    for label, path in CHECKS.items():
        try:
            c = count(path, tree)
        except FileNotFoundError:
            c = "ABSENT"
        summary["results"][label] = c
        if c in ("STALE", "ABSENT") or (
            "/" in c and c.split("/")[0] != c.split("/")[1]
        ):
            bad.append((label, c))
    with open(os.path.join(REPO, "SWEEPS_r15.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
        fh.write("\n")
    for src, (dst, fixture) in COPIES.items():
        if fixture is None:
            shutil.copyfile(os.path.join(REPO, src), os.path.join(REPO, dst))
            continue
        with open(os.path.join(REPO, src)) as fh:
            data = json.load(fh)
        with open(os.path.join(REPO, fixture, "MANIFEST.json")) as fh:
            data["_fixture_manifest"] = json.load(fh)
        with open(os.path.join(REPO, dst), "w") as fh:
            json.dump(data, fh, indent=1)
            fh.write("\n")
    print(json.dumps(summary["results"], indent=1))
    if bad:
        print("NOT GREEN:", bad)
        sys.exit(1)
    print("ALL GREEN — artifacts written")


if __name__ == "__main__":
    main()
