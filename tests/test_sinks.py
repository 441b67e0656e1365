"""S7 result sink: structured metrics → the reference's CSV row schema.

The reference's only tabular output is process.js's regex-parsed CSV
(process.js:8 fixes the column set). This engine flattens
LeidenRunResult.metrics into the SAME columns without the printf/regex hop;
these tests pin the schema, the phase-time accounting, and the csv/csv-dir
layouts against that contract.
"""

import csv
import math
import os

from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
from leiden_communities_openmp_spark.operators.leiden import leiden_scale
from leiden_communities_openmp_spark.sinks import (
    _COLUMNS, result_row, write_results_csv, write_results_csv_dir,
)
from leiden_communities_openmp_spark.sources.mtx import read_mtx_spark

from .conftest import MTX_DIR


def _run(spark, **kw):
    edges, _ = read_mtx_spark(spark, os.path.join(MTX_DIR, "karate.mtx"))
    return edges, leiden_scale(spark, edges, LeidenOptions(), **kw)


def test_result_row_schema_and_accounting(spark, tmp_path):
    edges, res = _run(spark)
    row = result_row(res, graph="karate", technique="leidenSpark",
                     cores=8, edges=edges)
    assert list(row) == _COLUMNS
    # phase accounting: total time covers every summed phase (ms)
    assert row["time"] >= row["initialization_time"]
    assert row["time"] > 0 and row["passes"] == res.passes
    assert row["iterations"] == res.iterations
    assert math.isclose(row["modularity"], res.modularity, abs_tol=1e-9)
    # Leiden guarantee: no internally-disconnected communities (V3)
    assert row["disconnected_communities"] == 0
    assert row["total_communities"] == res.membership.select(
        "community").distinct().count()
    assert row["order"] == 34 and row["size"] == edges.count()

    out = tmp_path / "results.csv"
    write_results_csv([row], str(out))
    with open(out, newline="") as f:
        back = list(csv.DictReader(f))
    assert len(back) == 1 and list(back[0]) == _COLUMNS
    assert back[0]["graph"] == "karate"
    assert float(back[0]["modularity"]) == row["modularity"]


def test_distributed_run_affected_vertices(spark):
    """Distributed sweep records per-round movers; the sink sums them into
    the reference's affected_vertices column (main.cxx prints the same
    tally from its aff counter)."""
    edges, res = _run(spark, driver_threshold=0, num_partitions=4)
    row = result_row(res, graph="karate", technique="leidenSparkSweep", cores=8)
    assert row["affected_vertices"] > 0
    assert row["local_moving_phase_time"] > 0
    # edges omitted → tally columns stay empty, like a non-trace run
    assert row["disconnected_communities"] == ""


def test_rounds_run_affected_vertices(spark):
    """Rounds-strategy passes now carry per-round mover logs too (round-3
    advice: they were silently 0), so the sink's affected_vertices tally
    covers BOTH distributed strategies."""
    edges, res = _run(spark, strategy="rounds", local_iters=4,
                      driver_threshold=0, driver_vertex_threshold=0)
    row = result_row(res, graph="karate", technique="leidenSparkRounds", cores=8)
    assert row["affected_vertices"] > 0
    assert row["local_moving_phase_time"] > 0


def test_csv_dir_per_graph(spark, tmp_path):
    edges, res = _run(spark)
    rows = [result_row(res, graph=g, technique="leidenSpark", cores=8)
            for g in ("g1", "g2", "g1")]
    write_results_csv_dir(rows, str(tmp_path / "out"))
    files = sorted(os.listdir(tmp_path / "out"))
    assert files == ["g1.csv", "g2.csv"]
    with open(tmp_path / "out" / "g1.csv", newline="") as f:
        assert len(list(csv.DictReader(f))) == 2
