"""Backend parity for the partition sweep kernel (no Spark needed).

The C kernel (operators/_ckernel.py) and the numpy block path are different
legal members of the parallel-Leiden family (true Gauss-Seidel vs
block-synchronous with acceptance recheck), so labels may differ between
backends; each must be deterministic, emit valid moves, and strictly
improve modularity on a planted two-clique graph.
"""

import numpy as np
import pandas as pd
import pytest

from leiden_communities_openmp_spark.operators import _ckernel
from leiden_communities_openmp_spark.operators.sweep import DriverState, sweep_partition


def _two_cliques(k: int = 6):
    """Two k-cliques joined by one bridge edge; symmetric directed rows."""
    rows = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    rows.append((base + i, base + j, 1.0))
    rows.append((k - 1, k, 1.0))
    rows.append((k, k - 1, 1.0))
    df = pd.DataFrame(rows, columns=["src", "dst", "w"]).sort_values(["src", "dst"])
    return df.reset_index(drop=True)


def _run(df, use_c: bool, direction: int = 0):
    if not use_c:
        _ckernel._tried, _ckernel._kernel = True, None     # force numpy path
    else:
        _ckernel._tried = False
        _ckernel._kernel = None
    try:
        vt = df.groupby("src")["w"].sum()
        state = DriverState(vt.index.to_numpy(np.int64), vt.to_numpy(np.float64))
        M = float(df["w"].sum()) / 2.0
        out = list(sweep_partition(iter([df]), state.snapshot(), M, 1.0, 1e-4,
                                   20, False, direction))[0]
        return out.sort_values("id").reset_index(drop=True), M
    finally:
        _ckernel._tried = False
        _ckernel._kernel = None


def _modularity(df, memb: dict, M: float) -> float:
    q_in = sum(w for s, d, w in df.itertuples(index=False) if memb[s] == memb[d])
    ctot = {}
    for s, _, w in df.itertuples(index=False):
        ctot[memb[s]] = ctot.get(memb[s], 0.0) + w
    return q_in / (2 * M) - sum((c / (2 * M)) ** 2 for c in ctot.values())


@pytest.mark.parametrize("use_c", [False, True])
def test_backend_valid_and_improving(use_c):
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    df = _two_cliques()
    out, M = _run(df, use_c)
    assert list(out.columns) == ["id", "community_new", "gain", "blocked"]
    assert (out["gain"] > 0).all()
    # apply moves; modularity must beat singletons and find the two cliques
    memb = {int(v): int(v) for v in pd.unique(df[["src", "dst"]].values.ravel())}
    for r in out.itertuples(index=False):
        memb[int(r.id)] = int(r.community_new)
    q0 = _modularity(df, {v: v for v in memb}, M)
    q1 = _modularity(df, memb, M)
    assert q1 > q0
    assert len(set(memb.values())) == 2


@pytest.mark.parametrize("use_c", [False, True])
def test_backend_deterministic(use_c):
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    df = _two_cliques(8)
    a, _ = _run(df, use_c, direction=-1)
    b, _ = _run(df, use_c, direction=-1)
    pd.testing.assert_frame_equal(a, b)


def test_refine_respects_bound_and_singletons():
    """Refine mode: moves only within the bound community, only while the
    source is still a singleton (inc/leiden.hxx:415,590)."""
    df = _two_cliques()
    vt = df.groupby("src")["w"].sum()
    state = DriverState(vt.index.to_numpy(np.int64), vt.to_numpy(np.float64))
    M = float(df["w"].sum()) / 2.0
    # bound: clique A -> 0, clique B -> 1 (positions aligned with vid)
    bound = (state.vid >= 6).astype(np.int64)
    out = list(sweep_partition(iter([df]), state.snapshot(bound), M, 1.0,
                               1e-4, 1, True, 0))[0]
    memb = dict(zip(state.vid.tolist(), state.vid.tolist()))
    for r in out.itertuples(index=False):
        memb[int(r.id)] = int(r.community_new)
    # no vertex may end up in a community anchored across the bound
    for v, c in memb.items():
        assert (v >= 6) == (c >= 6)
