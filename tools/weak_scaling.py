#!/usr/bin/env python3
"""Data-size (weak) scaling witness: same cores, 4× the graph.

The two-cluster-size experiment (tools/scaling.py) evidences core-count
scaling; this one evidences DATA scaling — the 100 TB extrapolation axis.
Runs the same Leiden job at n and 4n vertices (≈4× edge rows: the planted
generator emits a fixed edges-per-vertex degree) on the same local[cpus],
interleaved reps, and reports end-to-end + per-super-step edge throughput
at both sizes. Linear-in-data behavior = the throughput ratio ≈ 1; a
super-constant per-pass overhead would show as throughput FALLING with
size (it rises slightly instead, because fixed per-round costs amortize).

Usage: python3 tools/weak_scaling.py [n_small] [cpus] [reps]
Writes BENCH/weak_scaling.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from scaling import run_once  # noqa: E402  (same CHILD job, reused)


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sizes = (n_small, 4 * n_small)
    runs: dict[int, list] = {s: [] for s in sizes}
    for _ in range(reps):                     # interleaved (steal-robust)
        for s in sizes:
            runs[s].append(run_once("leiden", cpus, s))
    report = {"cpus": cpus}
    rates = {}
    for s in sizes:
        best = min(runs[s], key=lambda r: r["seconds"])
        best["reps_seconds"] = [r["seconds"] for r in runs[s]]
        best["edges_per_sec_end2end"] = round(
            best["edges"] * best["passes"] / best["seconds"])
        if best["move_seconds"]:
            best["edges_per_sec_per_superstep"] = round(
                best["edges"] * best["sweep_passes"] / best["move_seconds"])
        rates[s] = best["edges_per_sec_end2end"]
        report[f"n_{s}"] = best
    report["throughput_ratio_4x_over_1x"] = round(
        rates[sizes[1]] / rates[sizes[0]], 3)
    out = REPO / "BENCH" / "weak_scaling.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
