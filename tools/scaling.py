#!/usr/bin/env python3
"""Two-cluster-size scaling experiment (north rule evidence).

Runs identical jobs — same input, same partitioning, therefore bit-identical
results — at local[8] (N cores) and local[32] (4N cores) in separate JVMs
and reports throughput at both plus scaling efficiency
eff = (rate_32 / rate_8) / 4 into BENCH/scaling.json.

Two jobs are measured:
1. ``leiden``  — distributed Leiden on a dense generated link graph
   (~13M symmetric edge rows). End-to-end plus the distributed move phase
   (the per-super-step throughput the headline metric is defined on).
2. ``ingest`` — the pages extraction job (Arrow-UDF html→text/outlinks +
   edge build): compute-bound, shuffle-light.

Usage: python3 tools/scaling.py [n_vertices] [n_pages]
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, __REPO__)
job = sys.argv[1]; cpus = int(sys.argv[2]); size = int(sys.argv[3])
from leiden_communities_openmp_spark.session import get_spark
spark = get_spark("scaling-" + job, cpus=cpus, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
if job == "leiden":
    from leiden_communities_openmp_spark.operators.graphgen import planted_hard
    from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
    from leiden_communities_openmp_spark.operators.leiden import leiden_scale
    from leiden_communities_openmp_spark.sources.edges import symmetricize_df
    e = symmetricize_df(planted_hard(spark, size))
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    # warm the python workers (fork + pandas import = cluster startup, not
    # throughput; paying it inside the timed window would skew the small
    # cluster's denominator and overstate efficiency)
    spark.range(100000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    t0 = time.time()
    res = leiden_scale(spark, e, LeidenOptions(), num_partitions=64, local_iters=10)
    dt = time.time() - t0
    import hashlib
    labels = sorted((r["id"], r["community"]) for r in res.membership.collect())
    h = hashlib.md5(json.dumps(labels).encode()).hexdigest()
    move_secs = sum(m.get("move_seconds", 0.0) for m in res.metrics)
    sweep_passes = sum(1 for m in res.metrics if m.get("strategy") == "sweep")
    print("RESULT " + json.dumps({
        "cpus": cpus, "edges": n_edges, "seconds": round(dt, 3),
        "move_seconds": round(move_secs, 3), "sweep_passes": sweep_passes,
        "passes": res.passes, "modularity": round(res.modularity, 9),
        "edges_per_sec_end2end": round(n_edges * res.passes / dt),
        "edges_per_sec_per_superstep": round(n_edges * sweep_passes / move_secs) if move_secs else None,
        "labels_md5": h,
    }))
else:
    # JVM-codegen-bound leg: MinHash signatures over a replicated document
    # corpus (xxhash64 over exploded shingles — whole-stage codegen)
    from pyspark.sql import functions as F
    from leiden_communities_openmp_spark.operators.dedup import minhash_signatures
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (docs.crossJoin(spark.range(size).select(F.col("id").alias("rep")))
           .select((F.col("doc_id") * size + F.col("rep")).alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" r"), F.col("rep").cast("string")).alias("text"))
           .repartition(64).localCheckpoint(eager=True))
    n_docs = big.count()
    t0 = time.time()
    n = minhash_signatures(big, num_hashes=16).count()
    dt = time.time() - t0
    print("RESULT " + json.dumps({
        "cpus": cpus, "docs": n_docs, "seconds": round(dt, 3),
        "docs_per_sec": round(n_docs / dt),
    }))
spark.stop()
"""


def run(job: str, cpus: int, size: int) -> dict:
    script = CHILD.replace("__REPO__", repr(str(REPO)))
    out = subprocess.run([sys.executable, "-u", "-c", script, job, str(cpus), str(size)],
                         capture_output=True, text=True, check=True).stdout
    for ln in out.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{out[-2000:]}")


def main():
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 64  # minhash replication factor
    report = {}

    l8 = run("leiden", 8, n_vertices)
    l32 = run("leiden", 32, n_vertices)
    assert l8["labels_md5"] == l32["labels_md5"], "parallelism changed the result!"
    report["leiden"] = {
        "local8": l8, "local32": l32, "identical_labels": True,
        "eff_end2end": round((l32["edges_per_sec_end2end"] / l8["edges_per_sec_end2end"]) / 4, 3),
        "eff_move_phase": round(
            (l32["edges_per_sec_per_superstep"] / l8["edges_per_sec_per_superstep"]) / 4, 3)
        if l8.get("edges_per_sec_per_superstep") and l32.get("edges_per_sec_per_superstep") else None,
    }

    i8 = run("minhash", 8, n_pages)
    i32 = run("minhash", 32, n_pages)
    report["minhash"] = {
        "local8": i8, "local32": i32,
        "eff": round((i32["docs_per_sec"] / i8["docs_per_sec"]) / 4, 3),
    }

    print(json.dumps(report, indent=1))
    out = REPO / "BENCH" / "scaling.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
