"""Partitioned Gauss-Seidel sweep — the engine's scale-mode move kernel.

Spark analogue of the reference's per-thread asynchronous local-moving
(leidenMoveOmpW, inc/leiden.hxx:646-668): the edge table is hash-partitioned
by ``src`` so every vertex's full adjacency lives in exactly one partition;
each partition task runs a Gauss-Seidel sweep over its own vertices against
a broadcast snapshot of (membership, vtot, ctot), applying moves to its
*local* copy as it goes (the same stale-read tolerance as the reference's
racy OpenMP loop); the driver then reconciles all emitted label changes
exactly and recomputes community weights. One coarse round == one Spark job.

Scale notes: edges (the 100 TB relation) never leave the executors; the
broadcast state is O(|V|) and works to ~10^8-10^9 vertices — beyond that the
pure-DataFrame rounds mode (operators/leiden.py _move_round) is the fallback,
trading per-round latency for unbounded state. Partition count is a fixed
parameter independent of core count, so results are bit-identical between
local[8] and local[32] — the scaling-efficiency experiment changes only
parallelism, never the computation.
"""

from __future__ import annotations

import numpy as np


class DriverState:
    """Dense driver-side state over the sorted vertex-id universe.

    Community ids live in the same id space as vertices (every community is
    anchored at a vertex id), exactly like the reference's vcom/ctot vectors
    (inc/leiden.hxx:1206-1217).
    """

    def __init__(self, vid: np.ndarray, vtot: np.ndarray):
        self.vid = np.asarray(vid, dtype=np.int64)      # sorted unique ids
        self.vtot = np.asarray(vtot, dtype=np.float64)
        self.comm = self.vid.copy()   # singleton init (inc/leiden.hxx:274-279)
        self.ctot = self.vtot.copy()

    def pos(self, ids: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.vid, ids)

    def recompute_ctot(self) -> None:
        self.ctot = np.zeros_like(self.vtot)
        np.add.at(self.ctot, self.pos(self.comm), self.vtot)

    def snapshot(self, bound: np.ndarray | None = None) -> dict:
        s = {"vid": self.vid, "comm": self.comm, "vtot": self.vtot, "ctot": self.ctot}
        if bound is not None:
            s["bound"] = bound
        return s

    def n_communities(self) -> int:
        return int(np.unique(self.comm).size)


def sweep_partition(pdf_iter, state: dict, M: float, R: float, E: float,
                    max_local_iters: int, refine: bool, direction: int = 0):
    """Executor-side sweep over one adjacency partition.

    ``pdf_iter``: iterator of pandas batches with columns (src, dst, w),
    sorted by (src, dst) within the partition. Yields one pandas DataFrame
    of (id, community_new, gain) for vertices that moved (last label wins;
    gain accumulated over local iterations).

    ``direction``: cross-partition oscillation damping. 0 = unconstrained
    (single partition — fresh state, no races). -1/+1 = only moves to a
    community id lower/higher than the current one are allowed this coarse
    round; alternating the sign each round makes a two-vertex swap cycle
    impossible (a swap needs one down-move AND one up-move in the same
    round), the standard deterministic remedy for bulk-synchronous
    label ping-pong between stale partitions.
    """
    import pandas as pd

    empty = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                          "community_new": pd.Series([], dtype="int64"),
                          "gain": pd.Series([], dtype="float64")})
    parts = list(pdf_iter)
    if not parts:
        yield empty
        return
    edf = pd.concat(parts, ignore_index=True)
    if len(edf) == 0:
        yield empty
        return

    vid = state["vid"]
    pos_map = {int(v): i for i, v in enumerate(vid)}
    comm_l = state["comm"].tolist()
    vtot_l = state["vtot"].tolist()
    ctot_l = state["ctot"].copy().tolist()
    bound_l = state["bound"].tolist() if refine else None

    src = edf["src"].to_numpy()
    dst_pos_l = np.searchsorted(vid, edf["dst"].to_numpy()).tolist()
    w_l = edf["w"].to_numpy(dtype=np.float64).tolist()

    u_ids, u_start = np.unique(src, return_index=True)
    u_end = np.append(u_start[1:], len(src)).tolist()
    u_start = u_start.tolist()
    u_pos = [pos_map[int(u)] for u in u_ids]
    u_ids = u_ids.tolist()
    local_ids = set(u_ids)

    moved: dict[int, int] = {}
    gains: dict[int, float] = {}
    two_mm = 2.0 * M * M
    for _ in range(max_local_iters):
        el = 0.0
        any_move = False
        for k in range(len(u_ids)):
            up = u_pos[k]
            uvt = vtot_l[up]
            d = comm_l[up]
            dp = pos_map[d]
            if refine and ctot_l[dp] > uvt:
                continue
            vcs = []
            vcout = {}
            ub = bound_l[up] if refine else 0
            for i in range(u_start[k], u_end[k]):
                vp = dst_pos_l[i]
                if vp == up:
                    continue
                if refine and bound_l[vp] != ub:
                    continue
                c = comm_l[vp]
                if c in vcout:
                    vcout[c] += w_l[i]
                else:
                    vcs.append(c)
                    vcout[c] = w_l[i]
            if not vcs:
                continue
            vdout = vcout.get(d, 0.0)
            ctd = ctot_l[dp]
            cmax = -1
            emax = 0.0
            for c in vcs:
                if c == d:
                    continue
                # direction rule applies only to REMOTE targets (community
                # anchor not owned by this partition): local moves see fresh
                # Gauss-Seidel state, and a cross-partition swap still needs
                # one up-move and one down-move in the same round — both
                # remote from their own partition's view — so swap cycles
                # remain impossible.
                if direction != 0 and c not in local_ids:
                    if direction > 0 and c <= d:
                        continue
                    if direction < 0 and c >= d:
                        continue
                g = (vcout[c] - vdout) / M - R * uvt * (uvt + ctot_l[pos_map[c]] - ctd) / two_mm
                if g > emax:
                    emax = g
                    cmax = c
            if cmax >= 0:
                ctot_l[dp] -= uvt
                ctot_l[pos_map[cmax]] += uvt
                comm_l[up] = cmax
                uid = int(u_ids[k])
                moved[uid] = cmax
                gains[uid] = gains.get(uid, 0.0) + emax
                el += emax
                any_move = True
        if refine or not any_move or el <= E:
            break

    ids = list(moved.keys())
    yield pd.DataFrame({
        "id": pd.Series(ids, dtype="int64"),
        "community_new": pd.Series([moved[i] for i in ids], dtype="int64"),
        "gain": pd.Series([gains[i] for i in ids], dtype="float64"),
    })
