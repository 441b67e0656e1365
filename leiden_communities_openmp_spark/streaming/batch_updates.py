"""Edge-batch updates — SURVEY.md §2.2 T7-T9 (inc/batch.hxx).

The reference ships dynamic-update hooks (insertion/deletion triples applied
between runs); here they are set-operations on the edge table, plus a
Structured Streaming wrapper that folds micro-batches of link events into
the canonical edge table with exactly the same tidy/apply semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_batch(edges: DataFrame, n_deletions: int, n_insertions: int,
                   seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """T7 (inc/batch.hxx:100-140): sample existing edges to delete and
    synthesize random non-edges to insert. Deterministic in ``seed``."""
    dels = (
        edges.orderBy(F.xxhash64("src", "dst", F.lit(seed)))
        .limit(n_deletions).select("src", "dst", "w")
    )
    verts = (
        edges.select(F.col("src").alias("id")).unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    a = verts.orderBy(F.xxhash64("id", F.lit(seed + 1))).limit(max(n_insertions * 2, 16))
    pairs = (
        a.select(F.col("id").alias("src")).crossJoin(a.select(F.col("id").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .orderBy(F.xxhash64("src", "dst", F.lit(seed + 2)))
        .limit(n_insertions)
        .withColumn("w", F.lit(1.0))
    )
    return dels, pairs


def tidy_batch(edges: DataFrame, deletions: DataFrame, insertions: DataFrame
               ) -> tuple[DataFrame, DataFrame]:
    """T8 tidyBatchUpdate (inc/batch.hxx:202-209): deletions must exist
    (left-semi), insertions must not (left-anti); both deduplicated and
    sorted by (src, dst)."""
    dels = (
        deletions.join(edges, ["src", "dst"], "left_semi")
        .dropDuplicates(["src", "dst"]).orderBy("src", "dst")
    )
    ins = (
        insertions.join(edges, ["src", "dst"], "left_anti")
        .dropDuplicates(["src", "dst"]).orderBy("src", "dst")
    )
    return dels, ins


def apply_batch(edges: DataFrame, deletions: DataFrame, insertions: DataFrame) -> DataFrame:
    """T9 applyBatchUpdate (inc/batch.hxx:241-248): remove deletions, add
    insertions."""
    kept = edges.join(deletions.select("src", "dst"), ["src", "dst"], "left_anti")
    return kept.unionByName(insertions.select("src", "dst", "w"))


def stream_edges_into_table(spark, events_stream: DataFrame, table_path: str,
                            checkpoint_path: str):
    """Structured Streaming front-end: micro-batches of link events
    (src, dst, w, op['insert'|'delete']) folded into the parquet edge table
    with tidy/apply semantics per batch. Returns the StreamingQuery."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            current = sess.read.parquet(table_path)
        except Exception:
            current = sess.createDataFrame([], "src long, dst long, w double")
        dels = batch_df.filter(F.col("op") == "delete").select("src", "dst", "w")
        ins = batch_df.filter(F.col("op") == "insert").select("src", "dst", "w")
        dels, ins = tidy_batch(current, dels, ins)
        apply_batch(current, dels, ins).write.mode("overwrite").parquet(table_path)

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )
