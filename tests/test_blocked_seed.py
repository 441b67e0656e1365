"""Direction-blocked positive movers must stay scannable (VERDICT r2 #3).

Sweep rounds alternate a direction constraint on remote targets; a vertex
whose ONLY positive move is rejected purely by the direction rule, with no
moving neighbor, used to vanish from the aff seed and never be rescanned
that pass. The kernel now emits such vertices as ``blocked=1`` rows (both
backends) and the driver unions them into the next round's seed, with seeds
self-activated in-task (a blocked vertex needs ITSELF rescanned, not just
its neighbors).

Fixture (direct kernel call, one partition of a larger universe): vertex 1
owns one edge to community 5 (anchored REMOTELY — not a src of this
partition), gain(1→5) > 0. Under direction=-1 the move is blocked (5 > 1);
under direction=+1 it is taken. No neighbor of 1 moves.
"""

import numpy as np
import pandas as pd
import pytest

from leiden_communities_openmp_spark.operators import _ckernel
from leiden_communities_openmp_spark.operators.sweep import sweep_partition


def _state():
    # universe: 0 (isolated), 1 (the probe), 5+6 merged into community 5
    vid = np.array([0, 1, 5, 6], dtype=np.int64)
    vtot = np.array([1.0, 10.0, 20.0, 10.0])
    comm = np.array([0, 1, 5, 5], dtype=np.int64)
    ctot = np.array([1.0, 10.0, 30.0, 0.0])   # positional, anchor-indexed
    return {"vid": vid, "vtot": vtot, "comm": comm, "ctot": ctot}


def _partition():
    # this partition holds only src=1's adjacency → community 5 is remote
    return pd.DataFrame({"src": [1], "dst": [5], "w": [10.0]})


def _sweep(use_c: bool, direction: int, seed=None):
    if not use_c:
        _ckernel._tried, _ckernel._kernel = True, None
    else:
        _ckernel._tried = False
        _ckernel._kernel = None
    try:
        state = _state()
        if seed is not None:
            state["changed_pos"] = np.asarray(seed, dtype=np.int64)
        out = list(sweep_partition(iter([_partition()]), state, M=20.0, R=1.0,
                                   E=1e-9, max_local_iters=4, refine=False,
                                   direction=direction))[0]
        return out.sort_values("id").reset_index(drop=True)
    finally:
        _ckernel._tried = False
        _ckernel._kernel = None


@pytest.mark.parametrize("use_c", [False, True])
def test_blocked_emitted_full_scan(use_c):
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    out = _sweep(use_c, direction=-1)
    assert list(out["id"]) == [1]
    assert list(out["blocked"]) == [1]          # no move applied
    assert list(out["community_new"]) == [1]    # unchanged label


@pytest.mark.parametrize("use_c", [False, True])
def test_blocked_emitted_when_self_seeded(use_c):
    """Seeded (pruned) round: vertex 1 is in the seed but none of its
    neighbors are — self-activation must scan it and emit the blocked row
    (previously the vertex was silently inactive)."""
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    out = _sweep(use_c, direction=-1, seed=[1])  # position of id 1
    assert list(out["id"]) == [1]
    assert list(out["blocked"]) == [1]


@pytest.mark.parametrize("use_c", [False, True])
def test_allowed_direction_moves(use_c):
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    out = _sweep(use_c, direction=1, seed=[1])
    movers = out[out["blocked"] == 0]
    assert list(movers["id"]) == [1]
    assert list(movers["community_new"]) == [5]
    assert movers["gain"].iloc[0] == pytest.approx(0.125)


@pytest.mark.parametrize("use_c", [False, True])
def test_mover_not_double_reported_as_blocked(use_c):
    """A vertex that moves is not also flagged blocked, even if an earlier
    inner iteration blocked it (per-scan flag overwrite)."""
    if use_c and _ckernel.get_kernel() is None:
        pytest.skip("no C toolchain")
    out = _sweep(use_c, direction=0)             # unconstrained: move happens
    assert list(out["blocked"]) == [0]
    assert list(out["community_new"]) == [5]
