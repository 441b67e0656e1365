"""Exact-match kernel vs the compiled reference oracle (SURVEY §5.1):
per-vertex labels identical, modularity allclose(1e-6), pass/iteration
counts equal — for every golden fixture, Leiden and Louvain."""

import math
import os

import pytest

from leiden_communities_openmp_spark.operators.kernel import (
    communities_disconnected, leiden_exact, louvain_exact,
)
from leiden_communities_openmp_spark.sources.fixtures import (
    FIXTURE_SPECS, fixture_is_weighted,
)
from leiden_communities_openmp_spark.sources.mtx import read_mtx_local

from .conftest import MTX_DIR, load_golden

CASES = [(n, m) for n in FIXTURE_SPECS for m in ("leiden", "louvain")]


def _graph(name):
    return read_mtx_local(os.path.join(MTX_DIR, f"{name}.mtx"),
                          weighted=fixture_is_weighted(name), symmetric=False)


@pytest.mark.parametrize("name,method", CASES, ids=[f"{n}-{m}" for n, m in CASES])
def test_exact_match(name, method):
    g = _graph(name)
    hdr, want = load_golden(name, method)
    res = (leiden_exact if method == "leiden" else louvain_exact)(g)
    got = {u: res.membership[u] for u in range(g.span) if g.exists[u]}
    assert got == want, f"label mismatch on {name}/{method}"
    assert math.isclose(res.modularity, hdr["modularity"], abs_tol=1e-6)
    assert res.passes == hdr["passes"]
    assert res.iterations == hdr["iterations"]
    assert res.communities == hdr["communities"]


def test_leiden_no_disconnected_communities():
    """The Leiden guarantee (README.md:19, inc/properties.hxx:379-401)."""
    for name in ("karate", "ring_of_cliques", "planted_sbm_s"):
        g = _graph(name)
        res = leiden_exact(g)
        assert communities_disconnected(g, res.membership) == 0


def test_determinism():
    g = _graph("web_toy")
    a = leiden_exact(g)
    b = leiden_exact(g)
    assert a.membership == b.membership
    assert a.modularity == b.modularity


def test_total_weight_invariant():
    """Total directed edge weight == 2M (each undirected edge twice)."""
    g = _graph("karate")
    res = leiden_exact(g)
    assert math.isclose(g.total_weight(), 2 * res.M, rel_tol=1e-12)


def test_dense_labels_when_multipass():
    """Final labels are dense 0-based when >= 2 passes ran (SURVEY §3.2)."""
    g = _graph("planted_sbm_s")
    res = leiden_exact(g)
    assert res.passes >= 2
    labels = sorted({res.membership[u] for u in range(g.span) if g.exists[u]})
    assert labels == list(range(len(labels)))
