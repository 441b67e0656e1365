#!/usr/bin/env python3
"""Generate golden MTX fixtures and reference-oracle dumps.

Writes tests/data/mtx/<name>.mtx and, for each fixture x {leiden, louvain},
tests/golden/<name>.<method>.txt (oracle stdout: JSON header + vertex\tcomm
lines). Run from the repo root after compiling tools/oracle (see
tools/oracle.cxx).
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from leiden_communities_openmp_spark.sources.fixtures import (  # noqa: E402
    FIXTURE_SPECS, fixture_is_weighted, write_fixture_mtx,
)

MTX_DIR = REPO / "tests" / "data" / "mtx"
GOLD_DIR = REPO / "tests" / "golden"
ORACLE = REPO / "tools" / "oracle"


def main():
    MTX_DIR.mkdir(parents=True, exist_ok=True)
    GOLD_DIR.mkdir(parents=True, exist_ok=True)
    for name in FIXTURE_SPECS:
        path = write_fixture_mtx(name, str(MTX_DIR))
        weighted = fixture_is_weighted(name)
        for method in ("leiden", "louvain"):
            out = subprocess.run(
                [str(ORACLE), path, "0", "1" if weighted else "0", method],
                capture_output=True, text=True, check=True,
            ).stdout
            hdr = json.loads(out.splitlines()[0])
            gold = GOLD_DIR / f"{name}.{method}.txt"
            gold.write_text(out)
            print(f"{name:18s} {method:8s} Q={hdr['modularity']:.6f} "
                  f"passes={hdr['passes']} iters={hdr['iterations']} comms={hdr['communities']}")


if __name__ == "__main__":
    main()
