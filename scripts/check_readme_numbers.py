#!/usr/bin/env python3
"""Fail loudly when README.md's Results table drifts from the latest
driver benchmark (VERDICT r04 weak #4: three headline numbers went stale
across rounds with nothing to catch it).

Reads the newest ``BENCH_r*.json`` at the repo root, extracts the parsed
metric + secondaries, and checks each mapped README number against it
within ``RTOL`` (the axon tunnel swings individual runs by ~±15%, so the
tolerance is drift-sized, not ulp-sized; a failure means REWRITE THE
NUMBER, not rerun the bench).

Run directly (``python scripts/check_readme_numbers.py``) or via
``tests/test_readme_numbers.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RTOL = 0.15

_SUPERSCRIPTS = str.maketrans("⁰¹²³⁴⁵⁶⁷⁸⁹⁻", "0123456789-")


def _parse_number(tok: str) -> float:
    """'346,000' / '4.2×10⁹' / '~400×' / '1.25e9' -> float."""
    tok = tok.strip().lstrip("~").rstrip("×x").replace(",", "")
    m = re.match(r"^([0-9.]+)[×x]10([⁰¹²³⁴⁵⁶⁷⁸⁹⁻]+)$", tok)
    if m:
        return float(m.group(1)) * 10.0 ** int(
            m.group(2).translate(_SUPERSCRIPTS))
    return float(tok)


# BENCH key -> regex over README.md with ONE capture group holding the
# number token. Anchored on stable phrases of each Results-table row.
CHECKS = {
    "__value__": r"\|\s*EKF-SLAM, 128-mission fleet[^|]*\|\s*([\d,\.]+) filter steps/s",
    "ekf_slam_fls_steps_per_sec_fleet128":
        r"\| EKF-SLAM FLS \(pixel measurements\), 128-mission fleet \|\s*([\d,\.]+) steps/s",
    "ekf_slam_steps_per_sec_fleet32_L256_reftuned":
        r"reference tunings \(256 landmark slots[^|]*\|\s*([\d,\.]+) steps/s",
    "raycast_fleet_closed_loop_steps_per_sec_1024":
        r"raycast→perception→SLAM\), 1024 missions \|\s*([\d,\.]+) steps/s",
    "pf_particle_updates_per_sec_1M":
        r"\|\s*([\d\.,]+×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+) particle-updates/s",
    "pf_realtime_factor_1M_particles":
        r"particle-updates/s, (~?[\d,\.]+)× real-time",
    "combined_1M_pf_slam_realtime_factor":
        r"Combined north-star mission[^|]*\|\s*(~?[\d,\.]+)× real-time",
    "ekf_localization_steps_per_sec_fleet64":
        r"\| EKF localization, 64-mission fleet[^|]*\|\s*([\d\.,]+(?:×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+)?) steps/s",
    "ekf_localization_steps_per_sec_fleet512":
        r"\| EKF localization, 512-mission fleet \|\s*([\d\.,]+(?:×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+)?) steps/s",
    "ekf15_steps_per_sec_fleet64":
        r"\| 15-state EKF \(robot_localization\), 64-mission fleet[^|]*\|\s*([\d\.,]+(?:×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+)?) steps/s",
    "ekf15_dual_pairs_per_sec_fleet64":
        r"15-state \*\*dual\*\* EKF pairs[^|]*\|\s*([\d\.,]+(?:×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+)?) pairs/s",
    "sam_dr_ticks_per_sec_fleet256":
        r"\| Dead-reckoning replay[^|]*\|\s*([\d\.,]+(?:×10[⁰¹²³⁴⁵⁶⁷⁸⁹]+)?) ticks/s",
}


def latest_bench() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise FileNotFoundError("no BENCH_r*.json at repo root")
    path = paths[-1]
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed") or {}
    vals = dict(parsed.get("secondary") or {})
    if "value" in parsed:
        vals["__value__"] = parsed["value"]
    return path, vals


def main() -> int:
    bench_path, vals = latest_bench()
    readme = open(os.path.join(ROOT, "README.md")).read()
    failures = []
    for key, pattern in CHECKS.items():
        if key not in vals:
            failures.append(f"{key}: missing from {bench_path}")
            continue
        m = re.search(pattern, readme)
        if not m:
            failures.append(f"{key}: README pattern not found: {pattern}")
            continue
        readme_v = _parse_number(m.group(1))
        bench_v = float(vals[key])
        rel = abs(readme_v - bench_v) / max(abs(bench_v), 1e-30)
        if rel > RTOL:
            failures.append(
                f"{key}: README says {m.group(1)!r} ({readme_v:g}) but "
                f"{os.path.basename(bench_path)} says {bench_v:g} "
                f"({100 * rel:.0f}% off) — update README.md's Results table")
    if failures:
        print(f"README drift vs {os.path.basename(bench_path)}:")
        for f_ in failures:
            print(" -", f_)
        return 1
    print(f"README numbers match {os.path.basename(bench_path)} "
          f"(rtol {RTOL}) — {len(CHECKS)} checks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
