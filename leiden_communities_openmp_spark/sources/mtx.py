"""MatrixMarket (MTX) source — the reference's native input format
(inc/mtx.hxx:39-140). Production inputs are the Iceberg-style ``pages``
table (sources/pages.py); MTX is kept as a test-fixture format.

Two readers:
- ``read_mtx_local``  : driver-side parse into the exact-match CsrGraph
  (1-based ids, vertex 0 a hole — inc/mtx.hxx:213).
- ``read_mtx_spark``  : distributed ``spark.read.text`` parse into an edge
  DataFrame (src, dst, w) + a span, for the scale-mode engine.
"""

from __future__ import annotations

import struct


def _f32(x: float) -> float:
    """Round-trip through float32, mirroring TYPE=float edge weights
    (main.cxx:16-19)."""
    return struct.unpack("f", struct.pack("f", x))[0]


def parse_mtx_text(text: str, weighted: bool = False):
    """Parse MTX content → (span, n, edges[(u, v, w)], header_symmetric).

    Mirrors readMtxDo (inc/mtx.hxx:119-135): skip %-comments, read
    ``rows cols size``, body lines ``u v [w]`` (w defaults 1), mirror each
    edge when the header says symmetric/skew-symmetric. Vertices 1..n all
    exist (inc/mtx.hxx:213); span = n + 1.
    """
    lines = text.splitlines()
    i = 0
    header_symmetric = False
    rows = cols = 0
    while i < len(lines):
        ln = lines[i]
        i += 1
        if ln.startswith("%%"):
            parts = ln.split()
            header_symmetric = len(parts) >= 5 and parts[4] in ("symmetric", "skew-symmetric")
            continue
        if ln.startswith("%"):
            continue
        hp = ln.split()
        rows, cols = int(hp[0]), int(hp[1])
        break
    n = max(rows, cols)
    edges: list[tuple[int, int, float]] = []
    for ln in lines[i:]:
        parts = ln.split()
        if len(parts) < 2:
            break
        u, v = int(parts[0]), int(parts[1])
        w = _f32(float(parts[2])) if (weighted and len(parts) > 2) else 1.0
        edges.append((u, v, w))
        if header_symmetric:
            edges.append((v, u, w))
    return n + 1, n, edges, header_symmetric


def read_mtx_local(path: str, weighted: bool = False, symmetric: bool = False):
    """Load an MTX file into the exact-match CsrGraph (sorted adjacency,
    keep-last dedup — inc/Graph.hxx:277-284). ``symmetric`` means the graph
    is already symmetric; otherwise it is symmetricized (main.cxx:94)."""
    from ..operators.kernel import csr_from_edges, symmetricize

    with open(path) as f:
        span, n, edges, _ = parse_mtx_text(f.read(), weighted)
    exists = [False] + [True] * n
    g = csr_from_edges(span, edges, exists=exists)
    if not symmetric:
        g = symmetricize(g)
    return g


def read_mtx_spark(spark, path: str, weighted: bool = False, symmetric: bool = False):
    """Distributed MTX scan → (edges DataFrame (src,dst,w), span).

    Spark's parallel text scan replaces the reference's chunked parallel
    parse (inc/mtx.hxx:152-193). Comment/header filtering is a pushed-down
    predicate; dedup keep-last collapses to dropDuplicates for w≡1 inputs.
    """
    from pyspark.sql import functions as F

    span, n, header_symmetric, hdr = _read_header_only(path)
    raw = spark.read.text(path)
    body = (
        raw.filter(~F.col("value").startswith("%"))
        .filter(F.trim(F.col("value")) != F.lit(hdr))  # drop the size-header row
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("p"))
        .filter(F.size("p") >= 2)
        .select(
            F.col("p")[0].cast("long").alias("src"),
            F.col("p")[1].cast("long").alias("dst"),
            (
                F.col("p")[2].cast("float").cast("double")
                if weighted
                else F.lit(None).cast("double")
            ).alias("wraw"),
        )
    )
    edges = body.select("src", "dst", F.coalesce(F.col("wraw"), F.lit(1.0)).alias("w"))
    if header_symmetric:
        edges = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    from .edges import dedup_keep_last, symmetricize_df

    edges = dedup_keep_last(edges)
    if not symmetric:
        edges = symmetricize_df(edges)
    return edges, span


def _read_header_only(path: str):
    """Driver-side header peek (a few lines only). Returns
    (span, n, header_symmetric, raw_size_line) — the raw size line is used
    to filter that single row out of the distributed scan."""
    with open(path) as f:
        header_symmetric = False
        for ln in f:
            if ln.startswith("%%"):
                parts = ln.split()
                header_symmetric = len(parts) >= 5 and parts[4] in ("symmetric", "skew-symmetric")
                continue
            if ln.startswith("%"):
                continue
            hp = ln.split()
            n = max(int(hp[0]), int(hp[1]))
            return n + 1, n, header_symmetric, ln.strip()
    raise ValueError(f"no MTX header in {path}")


def write_mtx(path: str, n: int, edges, weighted: bool = False) -> None:
    """Write a general (asymmetric) coordinate MTX file with 1-based ids."""
    kind = "real" if weighted else "pattern"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {kind} general\n")
        f.write(f"{n} {n} {len(edges)}\n")
        for e in edges:
            if weighted:
                u, v, w = e
                f.write(f"{u} {v} {w}\n")
            else:
                u, v = e[0], e[1]
                f.write(f"{u} {v}\n")
