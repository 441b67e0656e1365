"""Deterministic test fixtures (seed=42, FIXTURES.md §1/§3).

- Golden MTX graphs fed both to the compiled reference oracle
  (tools/oracle.cxx) and to our engine for exact-label matching.
- A Common-Crawl-style ``pages`` table (url, warc_ts, html, text, lang) with
  planted-partition outlinks, used for the ingestion slice
  (BASELINE.json input_hint) — the expected extracted ``text`` is generated
  alongside ``html`` so extraction is checkable byte-for-byte.

Everything is pure-Python deterministic: same seed → same bytes.
"""

from __future__ import annotations

import random

# ---------------------------------------------------------------------------
# Golden MTX graphs (FIXTURES.md §3)
# ---------------------------------------------------------------------------

# Zachary karate club, 34 vertices / 78 undirected edges (public domain).
KARATE_EDGES = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (1, 8), (1, 9), (1, 11),
    (1, 12), (1, 13), (1, 14), (1, 18), (1, 20), (1, 22), (1, 32),
    (2, 3), (2, 4), (2, 8), (2, 14), (2, 18), (2, 20), (2, 22), (2, 31),
    (3, 4), (3, 8), (3, 9), (3, 10), (3, 14), (3, 28), (3, 29), (3, 33),
    (4, 8), (4, 13), (4, 14),
    (5, 7), (5, 11),
    (6, 7), (6, 11), (6, 17),
    (7, 17),
    (9, 31), (9, 33), (9, 34),
    (10, 34),
    (14, 34),
    (15, 33), (15, 34),
    (16, 33), (16, 34),
    (19, 33), (19, 34),
    (20, 34),
    (21, 33), (21, 34),
    (23, 33), (23, 34),
    (24, 26), (24, 28), (24, 30), (24, 33), (24, 34),
    (25, 26), (25, 28), (25, 32),
    (26, 32),
    (27, 30), (27, 34),
    (28, 34),
    (29, 32), (29, 34),
    (30, 33), (30, 34),
    (31, 33), (31, 34),
    (32, 33), (32, 34),
    (33, 34),
]


def gen_karate():
    return 34, KARATE_EDGES, False


def gen_planted_sbm(n: int, k: int, p_in: float, p_out: float, seed: int = 42):
    """Planted-partition graph: k equal blocks, intra-prob p_in, inter p_out.
    1-based vertex ids; one direction per undirected pair (u < v)."""
    rng = random.Random(seed)
    block = n // k
    edges = []
    for u in range(1, n + 1):
        bu = (u - 1) // block
        for v in range(u + 1, n + 1):
            bv = (v - 1) // block
            p = p_in if bu == bv else p_out
            if rng.random() < p:
                edges.append((u, v))
    return n, edges, False


def gen_web_toy(n: int = 300, seed: int = 42):
    """Directed asymmetric toy web graph with hub tail — exercises the
    symmetric=0 → symmetricize path (main.cxx:94)."""
    rng = random.Random(seed)
    edges = set()
    hubs = list(range(1, 11))
    for u in range(1, n + 1):
        deg = 2 + int(rng.random() * 6)
        for _ in range(deg):
            if rng.random() < 0.3:
                v = rng.choice(hubs)
            else:
                # prefer same block of 30 (planted community structure)
                base = ((u - 1) // 30) * 30
                v = base + 1 + int(rng.random() * 30)
            if v != u and 1 <= v <= n:
                edges.add((u, v))
    return n, sorted(edges), False


def gen_weighted_dyadic(n: int = 100, seed: int = 42):
    """Weighted graph with dyadic-rational weights k/8 so float32-in /
    float64-accumulated sums are exact (SURVEY.md §7.4)."""
    rng = random.Random(seed)
    edges = []
    for u in range(1, n + 1):
        base = ((u - 1) // 10) * 10
        for _ in range(4):
            v = base + 1 + int(rng.random() * 10)
            if v != u:
                w = (1 + int(rng.random() * 16)) / 8.0
                edges.append((u, v, w))
    # keep-last dedup happens in both loaders; keep duplicates to exercise it
    return n, edges, True


def gen_ring_of_cliques(k: int = 10, c: int = 10):
    """k cliques of size c joined in a ring by single bridges — the classic
    Leiden-vs-Louvain refinement/disconnection stressor."""
    edges = []
    n = k * c
    for b in range(k):
        base = b * c
        for i in range(1, c + 1):
            for j in range(i + 1, c + 1):
                edges.append((base + i, base + j))
        nxt = ((b + 1) % k) * c
        edges.append((base + 1, nxt + 2))
    return n, edges, False


def gen_selfloops(n: int = 50, seed: int = 42):
    rng = random.Random(seed)
    edges = []
    for u in range(1, n + 1):
        base = ((u - 1) // 5) * 5
        for _ in range(3):
            v = base + 1 + int(rng.random() * 5)
            if v != u:
                edges.append((u, v))
        if u % 4 == 0:
            edges.append((u, u))  # self-loop: retained in vtot (inc/leiden.hxx:200-206)
    return n, sorted(set(edges)), False


FIXTURE_SPECS = {
    # name: (generator() -> (n, edges, weighted), symmetric_input)
    "karate": (gen_karate, False),
    "planted_sbm_s": (lambda: gen_planted_sbm(200, 8, 0.3, 0.01), False),
    "planted_sbm_m": (lambda: gen_planted_sbm(1000, 20, 0.15, 0.002), False),
    "web_toy": (gen_web_toy, False),
    "weighted_dyadic": (gen_weighted_dyadic, False),
    "ring_of_cliques": (gen_ring_of_cliques, False),
    "selfloops": (gen_selfloops, False),
}


def write_fixture_mtx(name: str, out_dir: str) -> str:
    from .mtx import write_mtx

    gen, _sym = FIXTURE_SPECS[name]
    n, edges, weighted = gen()
    path = f"{out_dir}/{name}.mtx"
    write_mtx(path, n, edges, weighted=weighted)
    return path


def fixture_is_weighted(name: str) -> bool:
    gen, _ = FIXTURE_SPECS[name]
    return gen()[2]


# ---------------------------------------------------------------------------
# Common-Crawl-style pages table (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_WORDS = (
    "graph link page crawl web index rank community spark shuffle partition "
    "vertex edge modularity cluster anchor hyperlink corpus token document"
).split()


def gen_pages(n_pages: int, seed: int = 42, mean_outdeg: int = 12, n_blocks: int = 8):
    """Deterministic pages rows: (url, warc_ts_epoch, html, text, lang,
    outlinks). Outlinks follow a planted-partition rule (mostly intra-block)
    with a Zipf-ish hub tail so the extracted graph has known community
    structure and degree skew (FIXTURES.md §1).

    ``text`` is exactly what the extractor must produce from ``html``:
    title + paragraph text, anchors stripped, whitespace-normalized.
    """
    rng = random.Random(seed)
    urls = [f"https://site{(i * 2654435761) % 97:04d}.example/p/{i:06d}" for i in range(n_pages)]
    block = max(1, n_pages // n_blocks)
    rows = []
    for i in range(n_pages):
        title = f"page {i} " + " ".join(rng.choice(_WORDS) for _ in range(4))
        para1 = " ".join(rng.choice(_WORDS) for _ in range(20))
        para2 = " ".join(rng.choice(_WORDS) for _ in range(15))
        # outlinks: planted partition + hub tail
        k = 1 + min(int(rng.paretovariate(1.3)), 4 * mean_outdeg)
        targets = set()
        base = (i // block) * block
        for _ in range(k):
            if rng.random() < 0.85:
                t = base + int(rng.random() * block)
            elif rng.random() < 0.5:
                t = int(rng.random() * min(20, n_pages))  # global hubs
            else:
                t = int(rng.random() * n_pages)
            if t != i and t < n_pages:
                targets.add(t)
        targets = sorted(targets)
        anchors = "".join(
            f'<a href="{urls[t]}">anchor {t}</a> ' for t in targets
        )
        html = (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{para1}</p>{anchors}<p>{para2}</p></body></html>"
        )
        text = f"{title} {para1} {para2}"
        lang = "en" if (i * 2654435761) % 10 < 9 else ("de" if i % 2 == 0 else "fr")
        rows.append(
            {
                "url": urls[i],
                "warc_ts": 1735689600 + i,  # 2025-01-01T00:00:00Z + i sec
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
                "outlinks": [urls[t] for t in targets],
            }
        )
    return rows


def pages_spark_df(spark, n_pages: int, seed: int = 42, with_expected: bool = False):
    """Materialize the pages table as a Spark DataFrame with the
    input_hint schema (url:string, warc_ts:timestamp, html:binary,
    text:string, lang:string). ``with_expected`` adds the expected-text and
    expected-outlinks columns for extractor property tests."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, BinaryType, LongType, StringType, StructField, StructType,
    )

    rows = gen_pages(n_pages, seed)
    fields = [
        StructField("url", StringType()),
        StructField("warc_ts_epoch", LongType()),
        StructField("html", BinaryType()),
        StructField("lang", StringType()),
    ]
    if with_expected:
        fields += [
            StructField("expected_text", StringType()),
            StructField("expected_outlinks", ArrayType(StringType())),
        ]
    data = [
        tuple(
            [r["url"], r["warc_ts"], r["html"], r["lang"]]
            + ([r["text"], r["outlinks"]] if with_expected else [])
        )
        for r in rows
    ]
    df = spark.createDataFrame(data, StructType(fields))
    return df.withColumn("warc_ts", F.timestamp_seconds("warc_ts_epoch")).drop("warc_ts_epoch")
