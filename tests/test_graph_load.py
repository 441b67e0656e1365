"""Loader parity: our MTX loader must build the bit-identical graph the
reference builds (including the updateAdd multigraph quirks), verified
against the compiled dumpgraph tool when present, plus structural
invariants that hold regardless."""

import os
import subprocess

import pytest

from leiden_communities_openmp_spark.operators.kernel import csr_from_edges, symmetricize
from leiden_communities_openmp_spark.sources.fixtures import FIXTURE_SPECS, fixture_is_weighted
from leiden_communities_openmp_spark.sources.mtx import read_mtx_local

from .conftest import MTX_DIR, REPO

DUMPGRAPH = os.path.join(REPO, "tools", "dumpgraph")


@pytest.mark.skipif(not os.path.exists(DUMPGRAPH), reason="dumpgraph not compiled")
@pytest.mark.parametrize("name", list(FIXTURE_SPECS))
def test_loader_bit_identical(name):
    weighted = fixture_is_weighted(name)
    out = subprocess.run(
        [DUMPGRAPH, os.path.join(MTX_DIR, f"{name}.mtx"), "0", "1" if weighted else "0"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    ref = [(int(a), int(b), float(c)) for a, b, c in (ln.split("\t") for ln in out[1:])]
    g = read_mtx_local(os.path.join(MTX_DIR, f"{name}.mtx"), weighted=weighted, symmetric=False)
    mine = [
        (u, g.dst[i], g.w[i])
        for u in range(g.span) if g.exists[u]
        for i in range(g.indptr[u], g.indptr[u + 1])
    ]
    assert mine == ref


def test_symmetric_closure_invariant():
    """(u,v) ∈ E ⇔ (v,u) ∈ E after symmetricize (FIXTURES.md §2)."""
    g = read_mtx_local(os.path.join(MTX_DIR, "web_toy.mtx"))
    pairs = {
        (u, g.dst[i])
        for u in range(g.span) if g.exists[u]
        for i in range(g.indptr[u], g.indptr[u + 1])
    }
    assert all((v, u) in pairs for (u, v) in pairs)


def test_keep_last_dedup():
    """Duplicate (u,v) inserts with different float32 weights survive as a
    multigraph on first build (the reference's full-pair-equality quirk);
    identical weights collapse."""
    g1 = csr_from_edges(3, [(1, 2, 1.0), (1, 2, 1.0)], exists=[False, True, True])
    assert g1.indptr[2] - g1.indptr[1] == 1
    g2 = csr_from_edges(3, [(1, 2, 0.5), (1, 2, 0.75)], exists=[False, True, True])
    assert g2.indptr[2] - g2.indptr[1] == 2  # both kept (inc/_algorithm.hxx:92-98)


def test_selfloops_in_vertex_weights():
    """Self-loop weight is retained in vtot (inc/leiden.hxx:200-206)."""
    from leiden_communities_openmp_spark.operators.kernel import _vertex_weights

    g = csr_from_edges(2, [(1, 1, 2.0)], exists=[False, True])
    assert _vertex_weights(g)[1] == 2.0
