"""Edge-table normalization (SURVEY.md §2.1 S5, §2.2 T1).

The engine's canonical relation is ``edges(src: long, dst: long, w: double)``
— pre-symmetricized, deduplicated, and (for heavy pipelines) repartitioned
by ``src`` so grouped per-vertex work sees each adjacency co-located
("CSR-style adjacency partitions", SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "w")


def dedup_keep_last(edges: DataFrame, order_col: str | None = None) -> DataFrame:
    """S5 edge finalize: one row per (src, dst), keeping the LAST weight
    (inc/Graph.hxx:277-284, keep-last union inc/_algorithm.hxx:176-207).

    With no ``order_col`` the input is treated as weight-unambiguous
    (w identical per (src,dst) — true for w≡1 link graphs) and collapses via
    an aggregation (one shuffle, map-side combine). With an ``order_col``
    (e.g. an ingestion sequence number) "last" is taken by max(order_col)
    via max_by — still a single hash aggregation, no window sort.
    """
    if order_col is None:
        # w is uniform per (src,dst) here; max() is a deterministic collapse
        return edges.groupBy("src", "dst").agg(F.max("w").alias("w"))
    return edges.groupBy("src", "dst").agg(
        F.expr(f"max_by(w, {order_col})").alias("w")
    )


def symmetricize_df(edges: DataFrame) -> DataFrame:
    """T1 symmetricize (inc/symmetricize.hxx:72-82): union the transpose,
    then dedup. For w-uniform graphs this is exactly the reference's
    keep-last semantics; for weighted graphs the reverse edge wins on
    conflict (documented scale-mode semantics; exact-match mode replicates
    the reference merge bit-for-bit in operators/kernel.py)."""
    fwd = edges.select("src", "dst", "w").withColumn("_ord", F.lit(0))
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    ).withColumn("_ord", F.lit(1))
    return dedup_keep_last(fwd.unionByName(rev), order_col="_ord")


def normalize_edges(edges: DataFrame, symmetric: bool = False,
                    weighted: bool = True) -> DataFrame:
    """Cast/select the canonical columns; optionally symmetricize."""
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        (F.col("w") if weighted and "w" in edges.columns else F.lit(1.0)).cast("double").alias("w"),
    )
    return e if symmetric else symmetricize_df(e)


def adjacency_partitioned(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Repartition by src and sort within partitions by (src, dst): a
    grouped/Arrow consumer sees each vertex's adjacency contiguously and
    ordered — the DataFrame analogue of the reference's CSR
    (inc/Graph.hxx:398-408)."""
    e = edges.repartition(num_partitions, "src") if num_partitions else edges.repartition("src")
    return e.sortWithinPartitions("src", "dst")


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as an endpoint (S4 analogue — isolated
    vertices of an MTX file are carried separately where needed)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """V4: out-degree per vertex (on a symmetric graph == degree)."""
    return edges.groupBy("src").agg(F.count("*").alias("degree"))
