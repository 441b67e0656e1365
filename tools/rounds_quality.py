#!/usr/bin/env python3
"""Rounds-strategy quality-parity witness at FULL budget (round-4 verdict
item 3): the capped-budget bench entries (max_passes=2, local_iters=6) are
deliberate timing witnesses and score far below the sweep path (0.223 vs
0.710 on the pages graph; 0.140 vs 0.975 at 1M vertices). Nothing on record
showed the unbounded-scale rounds path converges to sweep-comparable
partitions when given the reference's own budget (max 10 passes, max 20
move rounds/pass, inc/leiden.hxx:62) — the one thing a 10^9-vertex user
needs to know. This runs rounds at full budget on both graphs and reports
modularity side by side with the sweep result on the SAME input.

Each leg runs in a child JVM (clean block manager). Writes
BENCH/rounds_quality.json.

Usage: python3 tools/rounds_quality.py [pages|planted|both] [n_vertices]
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import hashlib, json, sys, time
sys.path.insert(0, __REPO__)
which = sys.argv[1]; strategy = sys.argv[2]; size = int(sys.argv[3])
from leiden_communities_openmp_spark.session import get_spark
spark = get_spark("rounds-quality", cpus=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
from leiden_communities_openmp_spark.operators.leiden import leiden_scale

if which == "pages":
    from leiden_communities_openmp_spark.sources.fixtures import pages_spark_df
    from leiden_communities_openmp_spark.sources.pages import ingest
    pages = pages_spark_df(spark, 8000).localCheckpoint(eager=True)
    edges, _ = ingest(pages)
    e = edges.localCheckpoint(eager=True)
else:
    from leiden_communities_openmp_spark.operators.graphgen import planted_hard
    from leiden_communities_openmp_spark.sources.edges import symmetricize_df
    e = symmetricize_df(planted_hard(spark, size)).localCheckpoint(eager=True)
n_edges = e.count()
spark.range(100000).repartition(64).mapInPandas(lambda it: it, "id long").count()

t0 = time.time()
if strategy == "rounds":
    # FULL budget: the reference's own caps (max 10 passes, 20 rounds/pass)
    res = leiden_scale(spark, e, LeidenOptions(), strategy="rounds",
                       local_iters=20, driver_threshold=0,
                       driver_vertex_threshold=0, num_partitions=64)
else:
    res = leiden_scale(spark, e, LeidenOptions(), num_partitions=64)
dt = time.time() - t0
labels = sorted((r["id"], r["community"]) for r in res.membership.collect())
h = hashlib.md5(json.dumps(labels).encode()).hexdigest()
recs = [m for m in res.metrics if "pass" in m and "strategy" in m]
print("RESULT " + json.dumps({
    "graph": which, "strategy": strategy, "edges": n_edges,
    "seconds": round(dt, 3), "passes": res.passes,
    "iterations": res.iterations,
    "modularity": round(res.modularity, 9), "labels_md5": h,
    "pass_trace": [
        {k: m.get(k) for k in ("pass", "strategy", "move_iterations",
                               "vertices", "communities", "edges")}
        for m in recs],
}))
"""


def run_leg(which: str, strategy: str, size: int) -> dict:
    code = CHILD.replace("__REPO__", repr(str(REPO)))
    out = subprocess.run(
        [sys.executable, "-c", code, which, strategy, str(size)],
        capture_output=True, text=True, timeout=7200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{which}/{strategy} leg failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "both"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    path = REPO / "BENCH" / "rounds_quality.json"
    result = json.loads(path.read_text()) if path.exists() else {}
    graphs = ["pages", "planted"] if target == "both" else [target]
    for which in graphs:
        legs = {}
        for strategy in ("sweep", "rounds"):
            print(f"== {which} / {strategy} ==", flush=True)
            legs[strategy] = run_leg(which, strategy, size)
            print(json.dumps({k: v for k, v in legs[strategy].items()
                              if k != "pass_trace"}), flush=True)
        qs, qr = legs["sweep"]["modularity"], legs["rounds"]["modularity"]
        result[which] = {
            "sweep": legs["sweep"], "rounds_full_budget": legs["rounds"],
            "modularity_gap_pct": round(100.0 * (qs - qr) / qs, 3) if qs else None,
        }
        path.write_text(json.dumps(result, indent=1))
        print(f"{which}: sweep Q={qs} rounds Q={qr} "
              f"gap={result[which]['modularity_gap_pct']}%", flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
