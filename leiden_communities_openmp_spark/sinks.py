"""Result sink: structured run metrics → the reference's CSV row schema (S7).

The reference's only tabular output is a log→CSV postprocessor: main.cxx
prints one ``{...ms, ...ms locmove, ... modularity, x/y disconnected}
technique`` line per (graph, technique) run and ``process.js`` regex-parses
those lines into per-graph CSV files (process.js:5-8, 46-92, 100-131;
columns fixed by the RRESLT regex at process.js:8 — a de-facto output
schema).

This engine never round-trips through printf: ``leiden_scale`` returns a
structured ``LeidenRunResult`` whose ``metrics`` list already carries every
phase timing the reference prints, so the Spark-first re-expression of S7 is
a direct flatten of that structure into the SAME column set — no regex state
machine, no lossy text hop. The CSV itself is one row per run (a few bytes),
so it is written driver-side like the reference does; the heavy inputs
(membership, edges) stay DataFrames and the disconnected/total community
tally reuses the distributed V3 operator.

Column mapping (reference field ← this engine):
  time                      ← total wall seconds × 1000 (ms, like main.cxx)
  marking_time              ← 0.0 (static runs; the reference's marking
                               phase only exists on its dead dynamic path)
  initialization_time       ← "setup" phase seconds × 1000
  first_pass_time           ← pass-1 record's pass_seconds × 1000
  local_moving_phase_time   ← Σ move_seconds × 1000
  refinement_phase_time     ← Σ refine_seconds × 1000
  aggregation_phase_time    ← Σ aggregate_seconds × 1000
  affected_vertices         ← Σ per-round movers (the sweep/rounds logs)
  iterations / passes / modularity ← LeidenRunResult fields
  disconnected_communities / total_communities ← V3 operator (optional)
  technique / graph / order / size / omp_num_threads ← caller context
    (omp_num_threads carries the Spark core count — the analogous knob)
"""

from __future__ import annotations

import csv
import os
from typing import Iterable

_COLUMNS = [
    "omp_num_threads", "graph", "order", "size",
    "time", "marking_time", "initialization_time", "first_pass_time",
    "local_moving_phase_time", "refinement_phase_time",
    "aggregation_phase_time", "affected_vertices",
    "iterations", "passes", "modularity",
    "disconnected_communities", "total_communities", "technique",
]


def result_row(result, *, graph: str, technique: str, cores: int,
               order: int | None = None, size: int | None = None,
               edges=None) -> dict:
    """Flatten one LeidenRunResult into the reference's CSV row schema.

    ``edges``: pass the symmetric edge DataFrame to also compute the
    disconnected/total community tally (V3, a distributed job); omit to
    leave those columns empty (the reference prints them only when
    BUILD_TRACE is on, main.cxx:63-71).
    """
    ms = lambda s: round(1000.0 * s, 3)
    # sum over ALL phase records (NOT a name-keyed dict): repeated phase
    # names — final_modularity after a resume, dynamic_batch — must each
    # contribute to the total instead of collapsing to the last record
    phase_recs = [m for m in result.metrics if "phase" in m]
    passes = [m for m in result.metrics if "pass" in m]
    first = passes[0] if passes else {}
    total_s = sum(m.get("pass_seconds", 0.0) for m in result.metrics) \
        + sum(m.get("seconds", 0.0) for m in phase_recs)
    setup_s = sum(m.get("seconds", 0.0) for m in phase_recs
                  if m.get("phase") == "setup")
    affected = sum(r.get("movers", 0)
                   for m in passes for r in m.get("rounds", []))
    disc = tot = ""
    if edges is not None:
        from .operators.aggregations import disconnected_communities
        row = disconnected_communities(edges, result.membership).collect()[0]
        disc, tot = int(row["disconnected"]), int(row["total"])
    if order is None:
        order = result.membership.count()
    if size is None and edges is not None:
        size = edges.count()
    return {
        "omp_num_threads": cores,
        "graph": graph,
        "order": order,
        "size": size if size is not None else "",
        "time": ms(total_s),
        "marking_time": 0.0,
        "initialization_time": ms(setup_s),
        "first_pass_time": ms(first.get("pass_seconds", 0.0)),
        "local_moving_phase_time": ms(sum(m.get("move_seconds", 0.0) for m in passes)),
        "refinement_phase_time": ms(sum(m.get("refine_seconds", 0.0) for m in passes)),
        "aggregation_phase_time": ms(sum(m.get("aggregate_seconds", 0.0) for m in passes)),
        "affected_vertices": affected,
        "iterations": result.iterations,
        "passes": result.passes,
        "modularity": round(result.modularity, 9),
        "disconnected_communities": disc,
        "total_communities": tot,
        "technique": technique,
    }


def write_results_csv(rows: Iterable[dict], out: str) -> None:
    """Write rows (from ``result_row``) as one CSV, reference column order
    (process.js writeCsv, process.js:32-38: header + quoted values)."""
    rows = list(rows)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=_COLUMNS, quoting=csv.QUOTE_ALL)
        w.writeheader()
        w.writerows(rows)


def write_results_csv_dir(rows: Iterable[dict], out_dir: str) -> None:
    """Per-graph CSV files, like ``process.js csv-dir`` (process.js:120-123)."""
    os.makedirs(out_dir, exist_ok=True)
    by_graph: dict[str, list[dict]] = {}
    for r in rows:
        by_graph.setdefault(r["graph"], []).append(r)
    for graph, rs in by_graph.items():
        write_results_csv(rs, os.path.join(out_dir, f"{graph}.csv"))
