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


def apply_batch_to_superstep(spark, checkpointer, deletions: DataFrame,
                             insertions: DataFrame):
    """Dynamic update at SUPER-STEP granularity — the reference ships
    dynamic-update hooks that are never called from any driver
    (inc/leiden.hxx:354-395 compile but are dead code); this engine makes
    them real. A tidy batch (original-vertex edge triples, symmetric if the
    graph is) is mapped into the latest checkpointed super-graph through
    the dendrogram-so-far (ucom), applied as signed weight deltas, and the
    pass state is overwritten in place — a subsequent ``leiden_scale(...,
    checkpointer=...)`` on the updated base table resumes mid-dendrogram on
    the updated coarse graph instead of recomputing finished passes.

    Returns the updated super-graph DataFrame. Deletion weights must match
    the stored edge weights (tidy_batch guarantees existence; weights come
    from the table)."""
    st = checkpointer.latest(spark)
    if st is None:
        raise ValueError("no committed super-step to update")
    p, ucom, g, E, ti, metrics = st
    m_src = ucom.select(F.col("id").alias("src"), F.col("community").alias("cs"))
    m_dst = ucom.select(F.col("id").alias("dst"), F.col("community").alias("cd"))

    def to_super(df: DataFrame, sign: float) -> DataFrame:
        return (
            df.join(m_src, "src").join(m_dst, "dst")
            .select(F.col("cs").alias("src"), F.col("cd").alias("dst"),
                    (F.col("w") * F.lit(sign)).alias("w"))
        )

    delta = to_super(deletions, -1.0).unionByName(to_super(insertions, 1.0))
    g2 = (
        g.unionByName(delta)
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
        .filter(F.abs(F.col("w")) > 1e-12)
    )
    # eager pin: save() overwrites the very pass directory ucom/g2 are
    # lazily reading — materialize both before the overwrite starts
    ucom = ucom.localCheckpoint(eager=True)
    g2 = g2.localCheckpoint(eager=True)
    checkpointer.save(p, ucom, g2, E, ti,
                      list(metrics) + [{"phase": "dynamic_batch",
                                        "applied_at_pass": p}])
    return g2


def stream_edges_into_table(spark, events_stream: DataFrame, table_path: str,
                            checkpoint_path: str):
    """Structured Streaming front-end: micro-batches of link events
    (src, dst, w, op['insert'|'delete']) folded into the parquet edge table
    with tidy/apply semantics per batch. Returns the StreamingQuery."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            # eager pin: the fold overwrites the very path it reads, so the
            # current rows must be materialized BEFORE the overwrite starts
            # (Spark cannot overwrite a path still being lazily read)
            current = sess.read.parquet(table_path).localCheckpoint(eager=True)
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
