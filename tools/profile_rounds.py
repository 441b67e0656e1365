#!/usr/bin/env python3
"""A/B harness for the rounds-strategy fallback witness (bench.py's
leiden_rounds_fallback config): wall time + labels md5, so optimization
work can prove 'faster at identical labels'.

Usage: python3 tools/profile_rounds.py [reps] [n_pages] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
    from leiden_communities_openmp_spark.operators.leiden import leiden_scale
    from leiden_communities_openmp_spark.session import get_spark
    from leiden_communities_openmp_spark.sources.fixtures import pages_spark_df
    from leiden_communities_openmp_spark.sources.pages import ingest

    spark = get_spark("profile-rounds", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    pages = pages_spark_df(spark, n_pages).localCheckpoint(eager=True)
    edges, _ = ingest(pages)
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()

    times, md5s = [], []
    res = None
    for _ in range(reps):
        t0 = time.time()
        res = leiden_scale(spark, edges, LeidenOptions(max_passes=2),
                           strategy="rounds", local_iters=6,
                           driver_threshold=0, driver_vertex_threshold=0)
        res.membership.count()
        dt = time.time() - t0
        labels = sorted((r["id"], r["community"]) for r in res.membership.collect())
        md5s.append(hashlib.md5(json.dumps(labels).encode()).hexdigest())
        times.append(round(dt, 2))
    out = {
        "edges": n_edges, "reps": times, "min": min(times),
        "labels_md5": md5s, "modularity": round(res.modularity, 6),
        "passes": res.passes, "iterations": res.iterations,
        "pass_metrics": [
            {k: v for k, v in m.items() if k != "rounds"}
            for m in res.metrics if "pass" in m],
    }
    print("PROFILE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
