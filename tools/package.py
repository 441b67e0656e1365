#!/usr/bin/env python3
"""Build the --py-files archive for spark-submit (north rule run surface).

Zips the pure-Python package (sources only — no tests, no caches) into
``dist/leiden_communities_openmp_spark.zip``. Executors unpack it onto
sys.path, so everything the mapInPandas/pandas-UDF closures import must be
inside; the package is dependency-free beyond pyspark/numpy/pandas, which
the cluster image provides.

    python3 tools/package.py
    spark-submit --master <cluster> \
        --py-files dist/leiden_communities_openmp_spark.zip main.py ...
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = "leiden_communities_openmp_spark"


def build(out_dir: pathlib.Path | None = None) -> pathlib.Path:
    out_dir = out_dir or REPO / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / f"{PKG}.zip"
    files = sorted(
        p for p in (REPO / PKG).rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            z.write(p, p.relative_to(REPO))
    print(f"{out} ({out.stat().st_size} bytes, {len(files)} files)")
    return out


if __name__ == "__main__":
    build()
