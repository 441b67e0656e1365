"""North-rule companion operators sharing the canonical edge table:
PageRank, connected components, label propagation, triangle count
(SURVEY.md §2.6). All pure DataFrame ops — no Python in the hot path.

Every operator is deterministic (fixed iteration counts or fixed-point with
deterministic tie-breaks) so the DuckDB oracles in __spark_entry__.py can
match values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _materialize(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def pagerank(edges: DataFrame, iterations: int = 5, damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank on the directed edge table → (id, rank).

    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/N)

    Scale design: ``ranks`` is the small relation (|V|), re-joined to the
    static ``edges``; contributions aggregate with map-side combine; AQE
    splits hub-destination skew. Deterministic for a fixed iteration count.
    """
    verts = _materialize(_vertices(edges))
    n = verts.count()
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("outdeg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        rd = ranks.join(outdeg, "id", "left")
        dangling = rd.filter(F.col("outdeg").isNull()).agg(F.sum("rank")).collect()[0][0] or 0.0
        contrib = (
            edges.join(rd.select(F.col("id").alias("src"), "rank", "outdeg"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("inflow"))
        )
        ranks = _materialize(
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
    return ranks


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Min-label propagation to a fixed point → (id, component), where the
    component label is the smallest member id (deterministic).

    Round: label(v) = min(label(v), min over neighbors' labels). Converges
    in graph-diameter rounds on a symmetric edge table; each round is one
    join + one aggregation over the static edges. (The two-phase
    large-star/small-star variant halves round counts on high-diameter
    graphs; link graphs are short-diameter so the simple exchange wins.)
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = _materialize(sym)
    labels = _vertices(edges).withColumn("component", F.col("id"))
    labels = _materialize(labels)
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.select(F.col("id").alias("dst"), "component"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("nbr"))
        )
        new_labels = _materialize(
            labels.join(nbr_min, "id", "left")
            .select("id", F.least(F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))).alias("component"))
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous LPA, fixed round count → (id, label).

    Each round every vertex takes the most frequent label among its
    neighbors (previous round's labels), ties broken by the smallest label —
    fully deterministic, and exactly expressible in SQL for the oracle.
    Vertices keep their label when they have no neighbors.
    """
    labels = _vertices(edges).withColumn("label", F.col("id"))
    labels = _materialize(labels)
    for _ in range(rounds):
        counted = (
            edges.join(labels.select(F.col("id").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
        top = counted.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        labels = _materialize(
            labels.select("id", F.col("label").alias("old"))
            .join(top.select("id", "label"), "id", "left")
            .select("id", F.coalesce("label", "old").alias("label"))
        )
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count → single row (triangles long).

    Orient each undirected edge a<b once, then count length-2 oriented paths
    a<b<c closed by (a,c): each triangle counted exactly once. Two shuffle
    joins; the first join's build side is the same oriented table (self-join
    on the middle vertex)."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    o = und.filter(F.col("src") < F.col("dst"))  # oriented a<b
    ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    paths = ab.join(bc, "b")
    tri = paths.join(ac, ["a", "c"], "left_semi")
    return tri.agg(F.count("*").alias("triangles"))


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation → (id, triangles)."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    o = und.filter(F.col("src") < F.col("dst"))
    ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")  # (a,b,c) triangles
    per = (
        tris.select(F.col("a").alias("id"))
        .unionByName(tris.select(F.col("b").alias("id")))
        .unionByName(tris.select(F.col("c").alias("id")))
        .groupBy("id").agg(F.count("*").alias("triangles"))
    )
    return per
