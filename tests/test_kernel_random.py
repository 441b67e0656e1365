"""Randomized exact-match vs the compiled reference oracle.

test_kernel_golden.py pins 7 curated fixtures; this file widens the
exact-label claim to SEEDED RANDOM graphs: each case generates a fresh
graph (G(n,p) with optional dyadic weights, self-loops, duplicate edges,
isolated vertices), runs the compiled reference binary (tools/oracle,
built from /root/reference's headers) and our sequential kernel on the
same MTX file, and requires identical per-vertex labels, modularity
allclose(1e-6), and equal pass/iteration/community counts — for both
Leiden and Louvain.

Skips (rather than fails) when tools/oracle is absent, so the suite stays
green on checkouts without the compiled fixture generator.
"""

import json
import math
import os
import random
import subprocess

import pytest

from leiden_communities_openmp_spark.operators.kernel import (
    leiden_exact, louvain_exact,
)
from leiden_communities_openmp_spark.sources.mtx import read_mtx_local, write_mtx

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "tools", "oracle")

needs_oracle = pytest.mark.skipif(
    not os.access(ORACLE, os.X_OK), reason="compiled reference oracle absent"
)

SEEDS = list(range(24))


def _rand_graph(seed: int):
    """Deterministic random graph: (n, edges, weighted).

    Mixes the regimes the curated fixtures cover one-at-a-time: sparse and
    dense G(n,p), dyadic-rational weights (k/8 — exact in every IEEE
    parse/accumulate), self-loops, duplicate edge records (keep-last dedup
    in both loaders), and declared-but-unused trailing vertices (the
    vertex-existence holes of SURVEY §2 S4).
    """
    rng = random.Random(1000 + seed)
    n = rng.randint(6, 48)
    p = rng.choice([0.08, 0.15, 0.3, 0.5])
    weighted = seed % 3 == 0
    with_loops = seed % 4 == 1
    edges = []
    for u in range(1, n + 1):
        for v in range(u + 1, n + 1):
            if rng.random() < p:
                if weighted:
                    edges.append((u, v, (1 + int(rng.random() * 16)) / 8.0))
                else:
                    edges.append((u, v))
    if with_loops:
        for u in range(1, n + 1, 5):
            edges.append((u, u, 1.0) if weighted else (u, u))
    # duplicate a few records to exercise keep-last dedup parity
    if edges and seed % 5 == 2:
        dups = [edges[i % len(edges)] for i in range(3)]
        if weighted:
            dups = [(u, v, w + 0.125) for (u, v, w) in dups]
        edges.extend(dups)
    if not edges:
        edges.append((1, 2, 1.0) if weighted else (1, 2))
    if seed % 6 == 3:
        n += 3  # trailing isolated vertices (existence holes)
    return n, edges, weighted


def _oracle(path: str, weighted: bool, method: str):
    out = subprocess.run(
        [ORACLE, path, "0", "1" if weighted else "0", method],
        capture_output=True, text=True, check=True,
    ).stdout
    lines = out.splitlines()
    hdr = json.loads(lines[0])
    memb = {int(a): int(b) for a, b in (ln.split("\t") for ln in lines[1:])}
    return hdr, memb


@needs_oracle
@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("method", ["leiden", "louvain"])
def test_random_graph_exact_match(tmp_path, seed, method):
    n, edges, weighted = _rand_graph(seed)
    path = str(tmp_path / f"rand{seed}.mtx")
    write_mtx(path, n, edges, weighted=weighted)

    hdr, want = _oracle(path, weighted, method)
    g = read_mtx_local(path, weighted=weighted, symmetric=False)
    res = (leiden_exact if method == "leiden" else louvain_exact)(g)
    got = {u: res.membership[u] for u in range(g.span) if g.exists[u]}

    assert got == want, f"label mismatch seed={seed} method={method}"
    assert math.isclose(res.modularity, hdr["modularity"], abs_tol=1e-6)
    assert res.passes == hdr["passes"]
    assert res.iterations == hdr["iterations"]
    assert res.communities == hdr["communities"]
