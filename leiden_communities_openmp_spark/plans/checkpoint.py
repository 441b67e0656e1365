"""Per-super-step checkpoint/resume (north rule; SURVEY.md §7 P4).

Every Leiden pass (super-step) persists to an Iceberg-style directory
layout under ``root``:

    root/
      pass_00001/
        membership/   parquet (id, community)      — dendrogram so far
        edges/        parquet (src, dst, w)        — aggregated graph
        _metrics.json                              — pass metrics + lineage
        _COMMITTED                                 — atomic completion marker

A pass directory is only considered complete once ``_COMMITTED`` exists
(written last), so a killed run resumes from the latest complete pass and
re-enters the loop at the recorded (pass, tolerance, iterations) state.
``_metrics.json`` records per-partition lineage: for each written relation,
the number of partitions and per-partition row counts, plus the upstream
pass it was derived from — enough to audit which partition of which
super-step produced any row.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- helpers ---------------------------------------------------------
    def _pass_dir(self, p: int) -> str:
        return os.path.join(self.root, f"pass_{p:05d}")

    @staticmethod
    def _partition_lineage(df: DataFrame) -> list[dict]:
        counts = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().orderBy("_pid").collect()
        )
        return [{"partition": int(r["_pid"]), "rows": int(r["count"])} for r in counts]

    # -- write -----------------------------------------------------------
    def save(self, p: int, membership: DataFrame, edges: DataFrame,
             tolerance: float, total_iters: int, metrics: list[dict]) -> None:
        d = self._pass_dir(p)
        membership.write.mode("overwrite").parquet(os.path.join(d, "membership"))
        edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        meta = {
            "pass": p,
            "tolerance": tolerance,
            "total_iterations": total_iters,
            "written_at": time.time(),
            "derived_from_pass": p - 1,
            "metrics": metrics,
            "lineage": {
                "membership": self._partition_lineage(membership),
                "edges": self._partition_lineage(edges),
            },
        }
        with open(os.path.join(d, "_metrics.json"), "w") as f:
            json.dump(meta, f, indent=1)
        with open(os.path.join(d, "_COMMITTED"), "w") as f:
            f.write("ok\n")

    # -- read ------------------------------------------------------------
    def latest(self, spark: SparkSession):
        """Return (pass, membership, edges, tolerance, total_iters, metrics)
        for the newest complete pass, or None."""
        if not os.path.isdir(self.root):
            return None
        done = sorted(
            d for d in os.listdir(self.root)
            if d.startswith("pass_") and os.path.exists(os.path.join(self.root, d, "_COMMITTED"))
        )
        if not done:
            return None
        d = os.path.join(self.root, done[-1])
        with open(os.path.join(d, "_metrics.json")) as f:
            meta = json.load(f)
        membership = spark.read.parquet(os.path.join(d, "membership"))
        edges = spark.read.parquet(os.path.join(d, "edges"))
        return (meta["pass"], membership, edges, meta["tolerance"],
                meta["total_iterations"], list(meta.get("metrics", [])))
