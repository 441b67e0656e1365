#!/usr/bin/env python3
"""Amdahl decomposition of a two-cluster-size scaling report.

For each phase (and the end-to-end total) of a BENCH/scaling*.json produced
by tools/scaling.py, fit t(c) = s + p/c through the two measured points
(composed per-phase times at the two core counts) and report the serial
intercept s, the parallel work p, and the efficiency the fit predicts at
any scale multiple of the parallel work — the quantitative form of the
"serial floor vanishes at data scale" argument in BENCH/BASELINE.md.

With two points the fit is exact (two unknowns), so this is a
decomposition, not a regression; its value is the extrapolation column and
the cross-size consistency check (s should be ~stable across input sizes
while p grows ~linearly with the data).

Usage: python3 tools/amdahl.py BENCH/scaling.json [data_scale_multiples...]
"""

from __future__ import annotations

import json
import sys


def fit(t_lo: float, t_hi: float, c_lo: int, c_hi: int) -> tuple[float, float]:
    """Solve s + p/c_lo = t_lo, s + p/c_hi = t_hi."""
    p = (t_lo - t_hi) / (1.0 / c_lo - 1.0 / c_hi)
    s = t_lo - p / c_lo
    return s, p


def eff(s: float, p: float, c_lo: int, c_hi: int) -> float:
    """Predicted c_lo→c_hi efficiency for a job with serial s, parallel p."""
    t_lo, t_hi = s + p / c_lo, s + p / c_hi
    return (t_lo / t_hi) / (c_hi / c_lo)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling.json"
    mults = [float(m) for m in sys.argv[2:]] or [1.0, 4.0, 100.0]
    rep = json.load(open(path))["leiden"]
    legs = sorted((k for k in rep if k.startswith("local")),
                  key=lambda k: int(k[len("local"):]))
    c_lo, c_hi = (int(k[len("local"):]) for k in legs)
    lo, hi = rep[legs[0]], rep[legs[1]]
    p_lo = lo.get("phases_composed", lo.get("phases", {}))
    p_hi = hi.get("phases_composed", hi.get("phases", {}))
    hdr = " | ".join(f"eff@{m:g}x" for m in mults)
    print(f"{path}  cores {c_lo}->{c_hi}")
    print(f"{'phase':15s} {'t_lo':>8s} {'t_hi':>8s} {'serial s':>9s} "
          f"{'parallel p':>10s}  {hdr}")
    rows = sorted(set(p_lo) | set(p_hi),
                  key=lambda k: -p_lo.get(k, 0.0))
    for key in rows + ["TOTAL"]:
        if key == "TOTAL":
            t_lo = lo.get("seconds_composed", lo["seconds"])
            t_hi = hi.get("seconds_composed", hi["seconds"])
        else:
            t_lo, t_hi = p_lo.get(key, 0.0), p_hi.get(key, 0.0)
        s, p = fit(t_lo, t_hi, c_lo, c_hi)
        cells = " | ".join(f"{eff(s, p * m, c_lo, c_hi):6.3f}" for m in mults)
        print(f"{key:15s} {t_lo:8.1f} {t_hi:8.1f} {s:9.1f} {p:10.1f}  {cells}")
    print("(negative s = the phase measured super-linear in this window — "
          "steal noise or cache effects; read it as s≈0)")


if __name__ == "__main__":
    main()
