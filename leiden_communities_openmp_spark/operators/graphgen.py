"""Deterministic arithmetic graph generator, expressible identically in
Spark and ANSI SQL (DuckDB) — the oracle substrate for the companion
operators (FIXTURES.md §4).

``block_circulant(n, b)``: n vertices in blocks of size b; vertex i with
block-offset j = i % b links to (i - j) + (j*a + c) % b for (a, c) in
STEPS. Properties (used by the analytic oracles):
- every vertex has out-degree |STEPS| (minus self-hits), no dangling nodes
- step (1, 1) is a full cycle through the block ⇒ each block is one
  connected component ⇒ component label (min member id) = i - (i % b)
- blocks are cliques-ish circulants with triangles, hubs absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STEPS = ((1, 1), (2, 3), (5, 7))


def block_circulant(spark: SparkSession, n: int = 4096, b: int = 64,
                    steps=STEPS) -> DataFrame:
    """Directed edge table (src, dst, w=1.0), self-loops removed.
    ``steps`` controls density — benchmarks pass larger step sets
    (see dense_steps) to scale per-vertex degree without changing |V|."""
    base = spark.range(n).select(F.col("id").alias("src"))
    parts = []
    for a, c in steps:
        j = F.col("src") % b
        dst = F.col("src") - j + (j * a + c) % b
        parts.append(base.select("src", dst.alias("dst")))
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return (
        e.filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("w", F.lit(1.0))
    )


def dense_steps(k: int):
    """k deterministic (a, c) step pairs with odd strides (distinct targets
    for most offsets); includes (1, 1) so each block stays connected."""
    return tuple((2 * i + 1, i + 1) for i in range(k))


def planted_hard(spark: SparkSession, n: int, b: int = 256,
                 intra: int = 8, inter: int = 3) -> DataFrame:
    """Harder deterministic benchmark graph: ``intra`` in-block circulant
    steps plus ``inter`` arithmetic cross-block edges per vertex (planted
    communities with noise — the local-moving phase needs real work, unlike
    the pure block graph that converges in one sweep). Pure integer
    arithmetic over spark.range: generation is fully distributed."""
    base = spark.range(n).select(F.col("id").alias("src"))
    parts = []
    j = F.col("src") % b
    for a, c in dense_steps(intra):
        parts.append(base.select("src", (F.col("src") - j + (j * a + c) % b).alias("dst")))
    for k in range(1, inter + 1):
        # noise edges into the k-th next block (nearby-block noise keeps the
        # coarsened super-graph sparse: ~inter super-edges per community)
        parts.append(base.select(
            "src", ((F.col("src") - j + k * b + (F.col("src") * 13 + k) % b) % n).alias("dst")))
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return e.filter(F.col("src") != F.col("dst")).distinct().withColumn("w", F.lit(1.0))


def block_circulant_sql(n: int = 4096, b: int = 64) -> str:
    """The identical edge table as a DuckDB SQL fragment (a CTE body)."""
    selects = []
    for a, c in STEPS:
        selects.append(
            f"SELECT i AS src, (i - (i % {b})) + ((i % {b}) * {a} + {c}) % {b} AS dst, "
            f"1.0 AS w FROM range({n}) t(i)"
        )
    union = " UNION ".join(selects)
    return (
        f"SELECT DISTINCT src, dst, w FROM ({union}) u WHERE src <> dst"
    )


def symmetric_sql(edges_sql: str) -> str:
    """Symmetric closure of an edge CTE (w uniform)."""
    return (
        f"SELECT DISTINCT src, dst, w FROM ("
        f"SELECT src, dst, w FROM ({edges_sql}) e1 "
        f"UNION SELECT dst AS src, src AS dst, w FROM ({edges_sql}) e2) s"
    )
