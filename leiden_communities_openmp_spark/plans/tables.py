"""Iceberg-style table layout (no Iceberg jars in this container — the
layout, snapshot metadata, and commit protocol are emulated over parquet;
swapping in real Iceberg is a write-path change only).

Layout:
    root/
      data/<partition>=<value>/part-*.parquet
      metadata/
        snap-<n>.json       — snapshot manifest: files, row counts, schema,
                              parent snapshot, operation
        _current            — pointer to the live snapshot (atomic rename)

Readers resolve ``_current`` → snapshot → file list, giving snapshot
isolation and time travel across super-steps; the checkpoint manager
(plans/checkpoint.py) uses the same commit-marker idea per pass.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def write_snapshot(df: DataFrame, root: str, partition_by: list[str] | None = None,
                   operation: str = "append") -> int:
    """Write a new snapshot of ``df`` and atomically move the current
    pointer. Returns the snapshot id."""
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    parent = current_snapshot_id(root)
    snap_id = (parent or 0) + 1
    data_dir = os.path.join(root, "data", f"snap-{snap_id}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)
    files = []
    for dirpath, _, names in os.walk(data_dir):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                files.append({"path": os.path.relpath(p, root), "bytes": os.path.getsize(p)})
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "operation": operation,
        "timestamp": time.time(),
        "schema": df.schema.jsonValue(),
        "partition_by": partition_by or [],
        "row_count": df.count(),
        "files": files,
    }
    snap_path = os.path.join(meta_dir, f"snap-{snap_id}.json")
    with open(snap_path, "w") as f:
        json.dump(manifest, f, indent=1)
    tmp = os.path.join(meta_dir, "_current.tmp")
    with open(tmp, "w") as f:
        f.write(str(snap_id))
    os.replace(tmp, os.path.join(meta_dir, "_current"))  # atomic commit
    return snap_id


def current_snapshot_id(root: str) -> int | None:
    p = os.path.join(root, "metadata", "_current")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_snapshot(spark: SparkSession, root: str, snapshot_id: int | None = None) -> DataFrame:
    """Read the current (or a historical) snapshot."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no snapshot in {root}")
    return spark.read.parquet(os.path.join(root, "data", f"snap-{sid}"))


def snapshot_history(root: str) -> list[dict]:
    meta_dir = os.path.join(root, "metadata")
    out = []
    if not os.path.isdir(meta_dir):
        return out
    for n in sorted(os.listdir(meta_dir)):
        if n.startswith("snap-") and n.endswith(".json"):
            with open(os.path.join(meta_dir, n)) as f:
                m = json.load(f)
            out.append({"snapshot_id": m["snapshot_id"], "parent_id": m["parent_id"],
                        "operation": m["operation"], "row_count": m["row_count"],
                        "timestamp": m["timestamp"]})
    return out
