#!/usr/bin/env python3
"""Two-cluster-size scaling experiment (north rule evidence).

Runs the identical Leiden job — same input, same num_partitions, therefore
bit-identical computation — at local[8] and local[32] in separate JVMs, and
reports throughput at both plus scaling efficiency
eff = (rate_32 / rate_8) / 4 into BENCH/BASELINE.md.

Usage: python3 tools/scaling.py [n_pages]
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
from leiden_communities_openmp_spark.session import get_spark
from leiden_communities_openmp_spark.sources.fixtures import pages_spark_df
from leiden_communities_openmp_spark.sources.pages import ingest
from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
from leiden_communities_openmp_spark.operators.leiden import leiden_scale
spark = get_spark("scaling", cpus=cpus, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
pages = pages_spark_df(spark, n_pages).localCheckpoint(eager=True)
edges, _ = ingest(pages)
edges = edges.localCheckpoint(eager=True)
n_edges = edges.count()
# warm-up pass excluded: JVM/codegen warmup distorts small runs
t0 = time.time()
res = leiden_scale(spark, edges, LeidenOptions(), num_partitions=32, driver_threshold=20000)
dt = time.time() - t0
labels = sorted((r["id"], r["community"]) for r in res.membership.collect())
import hashlib
h = hashlib.md5(json.dumps(labels).encode()).hexdigest()
print("RESULT " + json.dumps({
    "cpus": cpus, "edges": n_edges, "seconds": round(dt, 3),
    "passes": res.passes, "modularity": round(res.modularity, 9),
    "edges_per_sec_per_superstep": round(n_edges * res.passes / dt),
    "labels_md5": h,
}))
spark.stop()
"""


def run(cpus: int, n_pages: int) -> dict:
    script = CHILD.format(repo=str(REPO))
    out = subprocess.run([sys.executable, "-u", "-c", script, str(cpus), str(n_pages)],
                         capture_output=True, text=True, check=True).stdout
    for ln in out.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{out[-2000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    r8 = run(8, n_pages)
    r32 = run(32, n_pages)
    assert r8["labels_md5"] == r32["labels_md5"], "parallelism changed the result!"
    eff = (r32["edges_per_sec_per_superstep"] / r8["edges_per_sec_per_superstep"]) / 4.0
    report = {"local8": r8, "local32": r32, "scaling_efficiency_8_to_32": round(eff, 3),
              "identical_labels": True, "n_pages": n_pages}
    print(json.dumps(report, indent=1))
    out = REPO / "BENCH" / "scaling.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
