#!/usr/bin/env python3
"""spark-submit entry point (the north rule's cluster-run surface).

Package the engine and submit — the cluster size, deploy mode, and executor
sizing live entirely on the submit command line; this script only declares
the job:

    python3 tools/package.py                       # → dist/leiden_communities_openmp_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/leiden_communities_openmp_spark.zip \
        main.py leiden --input s3://bucket/edges/ --output /out/membership \
        --checkpoint /ck --num-partitions 4096 --metrics /out/metrics.json

Jobs (each shares the same edge table + partitioning, per the north rule):

    leiden | louvain   community detection (membership parquet + metrics
                       JSON + S7-schema CSV row)
    pagerank           per-vertex score (dangling mass folded in-plan)
    cc                 connected components (large-star/small-star)
    lpa                label propagation
    triangles          per-vertex triangle counts
    ingest             Common-Crawl-style pages table → deduplicated
                       symmetric (src,dst,w) edge table + url↔id map

Inputs: ``--input-format edges`` (parquet src/dst[/w]), ``mtx`` (MatrixMarket,
1-based, reference quirks preserved), or ``pages`` (url, warc_ts, html, text,
lang — the north rule's input hint; ingest/leiden accept it directly).
Edge inputs are normalized with the same keep-last dedup + symmetricize the
reference's loader applies (sources/edges.py); pass --raw to skip when the
table is already canonical.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse(argv):
    ap = argparse.ArgumentParser(prog="main.py", description=__doc__)
    ap.add_argument("job", choices=["leiden", "louvain", "pagerank", "cc",
                                    "lpa", "triangles", "ingest"])
    ap.add_argument("--input", required=True, help="edge parquet / .mtx / pages parquet")
    ap.add_argument("--input-format", choices=["edges", "mtx", "pages"],
                    default=None, help="default: mtx for *.mtx, else edges")
    ap.add_argument("--output", required=True, help="result parquet directory")
    ap.add_argument("--metrics", default=None, help="metrics JSON path (driver-local)")
    ap.add_argument("--csv", default=None, help="S7-schema CSV path (leiden/louvain)")
    ap.add_argument("--checkpoint", default=None, help="super-step checkpoint dir (resume)")
    ap.add_argument("--graph-name", default=None, help="graph label for the CSV row")
    ap.add_argument("--raw", action="store_true",
                    help="edges input is already deduplicated + symmetric")
    ap.add_argument("--num-partitions", type=int, default=None,
                    help="sweep partition count (default: shuffle partitions)")
    ap.add_argument("--strategy", choices=["auto", "sweep", "rounds"], default="auto")
    ap.add_argument("--resolution", type=float, default=1.0)
    ap.add_argument("--tolerance", type=float, default=1e-2)
    ap.add_argument("--max-passes", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=5, help="pagerank iterations / lpa rounds")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--output-format", choices=["parquet", "snapshot"],
                    default="parquet",
                    help="snapshot = Iceberg-style layout (plans/tables.py): "
                         "snapshot manifests + atomic current pointer, "
                         "time-travel readable")
    return ap.parse_args(argv)


def _write_out(df, path, args):
    if args.output_format == "snapshot":
        from leiden_communities_openmp_spark.plans.tables import write_snapshot
        return write_snapshot(df, path)
    df.write.mode("overwrite").parquet(path)
    return None


def _read_out(spark, path, args):
    if args.output_format == "snapshot":
        from leiden_communities_openmp_spark.plans.tables import read_snapshot
        return read_snapshot(spark, path)
    return spark.read.parquet(path)


def _load_edges(spark, args):
    from leiden_communities_openmp_spark.sources.edges import normalize_edges
    from leiden_communities_openmp_spark.sources.mtx import read_mtx_spark

    fmt = args.input_format or ("mtx" if args.input.endswith(".mtx") else "edges")
    if fmt == "mtx":
        edges, _ = read_mtx_spark(spark, args.input)
        return edges
    if fmt == "pages":
        from leiden_communities_openmp_spark.sources.pages import ingest
        edges, _ = ingest(spark.read.parquet(args.input))
        return edges
    from pyspark.sql import functions as F
    df = spark.read.parquet(args.input)
    if "w" not in df.columns:
        df = df.withColumn("w", F.lit(1.0))
    df = df.select(F.col("src").cast("long"), F.col("dst").cast("long"),
                   F.col("w").cast("double"))
    return df if args.raw else normalize_edges(df, symmetric=True)


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])
    from leiden_communities_openmp_spark.session import get_spark_submit
    spark = get_spark_submit(f"leiden-spark-{args.job}", args.shuffle_partitions)
    metrics = run_job(spark, args)
    print(json.dumps({k: v for k, v in metrics.items() if k != "phases"}))
    spark.stop()
    return 0


def run_job(spark, args) -> dict:
    t0 = time.time()
    metrics: dict = {"job": args.job, "input": args.input}

    if args.job == "ingest":
        from leiden_communities_openmp_spark.sources.pages import ingest
        edges, url_map = ingest(spark.read.parquet(args.input))
        _write_out(edges, args.output, args)
        _write_out(url_map, args.output.rstrip("/") + "_urls", args)
        metrics["edges"] = _read_out(spark, args.output, args).count()
    elif args.job in ("leiden", "louvain"):
        from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
        from leiden_communities_openmp_spark.operators.leiden import leiden_scale
        from leiden_communities_openmp_spark.plans.checkpoint import CheckpointManager
        from leiden_communities_openmp_spark.sinks import result_row, write_results_csv

        edges = _load_edges(spark, args)
        ck = CheckpointManager(args.checkpoint) if args.checkpoint else None
        kw = {}
        if args.num_partitions:
            kw["num_partitions"] = args.num_partitions
        res = leiden_scale(
            spark, edges,
            LeidenOptions(resolution=args.resolution, tolerance=args.tolerance,
                          max_passes=args.max_passes),
            refine=args.job == "leiden", checkpointer=ck,
            strategy=args.strategy, **kw)
        _write_out(res.membership, args.output, args)
        metrics.update({"modularity": res.modularity, "passes": res.passes,
                        "iterations": res.iterations, "phases": res.metrics})
        if args.csv:
            name = args.graph_name or args.input.rstrip("/").rsplit("/", 1)[-1]
            cores = spark.sparkContext.defaultParallelism
            write_results_csv(
                [result_row(res, graph=name, technique=f"{args.job}Spark",
                            cores=cores, edges=edges)], args.csv)
    else:
        from leiden_communities_openmp_spark.operators import companions as C
        edges = _load_edges(spark, args)
        if args.job == "pagerank":
            out = C.pagerank(edges, iterations=args.iterations, damping=args.damping)
        elif args.job == "cc":
            out = C.connected_components(edges)
        elif args.job == "lpa":
            out = C.label_propagation(edges, rounds=args.iterations)
        else:
            out = C.triangle_count_per_vertex(edges)
        _write_out(out, args.output, args)
        metrics["rows"] = _read_out(spark, args.output, args).count()

    metrics["seconds"] = round(time.time() - t0, 3)
    if args.metrics:
        with open(args.metrics, "w") as f:
            json.dump(metrics, f, indent=1, default=str)
    return metrics


if __name__ == "__main__":
    sys.exit(main())
