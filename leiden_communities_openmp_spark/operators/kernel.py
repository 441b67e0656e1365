"""Exact-match Leiden/Louvain kernel (deterministic-match mode).

A from-scratch Python re-implementation of the *sequential deterministic*
semantics of the reference (GVE-Leiden). It exists so that pytest can assert
bit-identical per-vertex community labels and 1e-6 modularity agreement
against a compiled reference oracle (tools/oracle.cxx) on small golden
fixtures. The distributed scale mode lives in ``operators/leiden.py``; both
share this module's options/result types and the CSR container.

Semantics replicated (citations are file:line in /root/reference):

- Gauss-Seidel local-moving sweep in ascending vertex-id order with moves
  applied immediately (inc/leiden.hxx:583-601).
- Strictly-positive-gain argmax with first-scanned-community tie-break
  (``e > emax`` over first-touch-ordered scan list, inc/leiden.hxx:492-502)
  and the ``c == 0`` no-move quirk (``if (c)`` guard, inc/leiden.hxx:594).
- Refinement: one constrained sweep over singleton-community vertices
  (skip when ``ctot[vcom[u]] > vtot[u]``, inc/leiden.hxx:590) restricted to
  the community bound (``vcob[u] == vcob[v]``, inc/leiden.hxx:415); refine
  returns 0 iterations (inc/leiden.hxx:598-600).
- Pass loop: tolerance E starting 1e-2, /=10 per pass; aggregation-tolerance
  0.8 early-exit; order-preserving dense renumbering; dendrogram flattening
  ``ucom[u] = vcom[ucom[u]]`` (inc/leiden.hxx:1125-1174).
- The refine-marking off-by-one: ``fillValueU(vaff.data(), x.order(), 1)``
  (inc/leiden.hxx:1138) marks only the first ``order()`` slots, so on the
  1-based first-pass graph the highest-id vertex keeps its stale flag.
- Aggregated super-graph adjacency is materialized in *first-touch scan
  order* (inc/leiden.hxx:926-939), which later sweeps then scan in that
  order — this drives tie-breaks in passes >= 2.
- Weights: input edge weights float32 (main.cxx:18), all accumulation in
  float64 (inc/leiden.hxx:69).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class LeidenOptions:
    """Mirrors LeidenOptions defaults (inc/leiden.hxx:62)."""

    resolution: float = 1.0
    tolerance: float = 1e-2
    aggregation_tolerance: float = 0.8
    tolerance_drop: float = 10.0
    max_iterations: int = 20
    max_passes: int = 10


@dataclass
class KernelResult:
    membership: list[int]          # indexed by vertex id 0..span-1
    exists: list[bool]
    iterations: int
    passes: int
    modularity: float
    communities: int
    M: float
    pass_log: list[dict] = field(default_factory=list)


class CsrGraph:
    """Minimal CSR digraph: adjacency kept in explicit list order.

    ``exists`` marks vertex holes (e.g. vertex 0 of a 1-based MTX graph,
    inc/mtx.hxx:213). Adjacency order is semantic: sorted by dst for
    first-pass graphs (LazyBitset sort, inc/_bitset.hxx:235), first-touch
    order for aggregated graphs.
    """

    __slots__ = ("span", "indptr", "dst", "w", "exists")

    def __init__(self, span: int, indptr: list[int], dst: list[int], w: list[float], exists: list[bool]):
        self.span = span
        self.indptr = indptr
        self.dst = dst
        self.w = w
        self.exists = exists

    @property
    def order(self) -> int:
        return sum(1 for e in self.exists if e)

    def vertices(self):
        for u in range(self.span):
            if self.exists[u]:
                yield u

    def total_weight(self) -> float:
        return sum(self.w)


def _unique_last_fullpair(ps: list[tuple[int, float]]) -> list[tuple[int, float]]:
    """unique_last_copy with DEFAULT pair equality — the 3-argument call
    inside set_union_last_inplace (inc/_algorithm.hxx:181/186 call
    inc/_algorithm.hxx:92-98 which compares (key, value) pairs, NOT keys).
    Consequence: a freshly-built vertex keeps duplicate (dst, w) entries
    whenever the weights differ — the reference graph is a *multigraph*
    for weighted inputs with repeated edges."""
    out: list[tuple[int, float]] = []
    n = len(ps)
    for i, p in enumerate(ps):
        if i + 1 < n and ps[i + 1] == p:
            continue
        out.append(p)
    return out


def _set_union_last(x: list[tuple[int, float]], y: list[tuple[int, float]]) -> list[tuple[int, float]]:
    """Behavioral replica of set_union_last_inplace
    (inc/_algorithm.hxx:177-214) with key-only less-than/equality, as used
    by LazyBitset::updateAdd (inc/_bitset.hxx:245-262).

    Observable semantics (all replicated, including the quirks):
    - aligned phase: y elements matching the current x head *replace* it
      (keep-last); x elements below the y head pass through;
    - if x is exhausted first, the y tail is appended through the 3-arg
      unique_last_copy (FULL-PAIR equality — duplicate keys survive);
    - once a y element is inserted *before* an x element (deque phase),
      a later key tie between a displaced x element and a y element emits
      BOTH (y first, x copy later) — duplicate (dst) entries survive.
    """
    if not y:
        return list(x)
    if not x:
        return _unique_last_fullpair(y)
    x = list(x)
    xi, yi = 0, 0
    nx, ny = len(x), len(y)
    while True:
        while x[xi][0] < y[yi][0]:
            xi += 1
            if xi == nx:
                return x + _unique_last_fullpair(y[yi:])
        if x[xi][0] != y[yi][0]:
            break
        x[xi] = y[yi]
        yi += 1
        if yi == ny:
            return x
    # deque phase
    from collections import deque

    out = x[:xi]
    q: deque = deque()
    q.append(x[xi])
    xi += 1
    out.append(y[yi])
    yi += 1
    while yi < ny:
        if out[-1][0] == y[yi][0]:
            out[-1] = y[yi]
            yi += 1
        else:
            if xi < nx:
                q.append(x[xi])
                xi += 1
            if q and q[0][0] < y[yi][0]:
                out.append(q.popleft())
            else:
                out.append(y[yi])
                yi += 1
    while True:
        if xi < nx:
            q.append(x[xi])
            xi += 1
        if not q:
            break
        out.append(q.popleft())
    return out


def _update_add(existing: list[tuple[int, float]], pending: list[tuple[int, float]]) -> list[tuple[int, float]]:
    """DiGraph finalize step for one vertex (inc/Graph.hxx:269-284):
    sort the pending (dst, w) pairs by key and set-union-last into the
    existing adjacency. NOTE: the reference uses std::sort (unstable); for
    the small per-vertex pending lists of our fixtures libstdc++ falls into
    its stable insertion-sort regime, which Python's stable sort matches."""
    pending = sorted(pending, key=lambda p: p[0])
    return _set_union_last(existing, pending)


def csr_from_edges(span: int, edges: list[tuple[int, int, float]], exists: list[bool] | None = None) -> CsrGraph:
    """Build a CSR graph from (src, dst, w) triples with the reference's
    exact first-update semantics (one DiGraph::update after all inserts)."""
    pend: list[list[tuple[int, float]]] = [[] for _ in range(span)]
    for s, d, wt in edges:
        pend[s].append((d, wt))
    if exists is None:
        exists = [False] * span
        for s, d, _ in edges:
            exists[s] = True
            exists[d] = True
    indptr = [0] * (span + 1)
    dsts: list[int] = []
    ws: list[float] = []
    for u in range(span):
        for d, wt in _update_add([], pend[u]):
            dsts.append(d)
            ws.append(wt)
        indptr[u + 1] = len(dsts)
    return CsrGraph(span, indptr, dsts, ws, list(exists))


def symmetricize(g: CsrGraph) -> CsrGraph:
    """symmetricize (inc/symmetricize.hxx:55-63): copy the finalized graph,
    add every reverse edge as pending (outer loop ascending u, adjacency
    order), then one update merges pending into existing per vertex."""
    pend: list[list[tuple[int, float]]] = [[] for _ in range(g.span)]
    adj: list[list[tuple[int, float]]] = [[] for _ in range(g.span)]
    for u in range(g.span):
        for i in range(g.indptr[u], g.indptr[u + 1]):
            adj[u].append((g.dst[i], g.w[i]))
            pend[g.dst[i]].append((u, g.w[i]))
    indptr = [0] * (g.span + 1)
    dsts: list[int] = []
    ws: list[float] = []
    for u in range(g.span):
        for d, wt in _update_add(adj[u], pend[u]):
            dsts.append(d)
            ws.append(wt)
        indptr[u + 1] = len(dsts)
    return CsrGraph(g.span, indptr, dsts, ws, list(g.exists))


def _vertex_weights(g: CsrGraph) -> list[float]:
    """vtot[u] = sum of incident weights, self-loops included
    (inc/leiden.hxx:200-206)."""
    vtot = [0.0] * g.span
    for u in g.vertices():
        s = 0.0
        for i in range(g.indptr[u], g.indptr[u + 1]):
            s += g.w[i]
        vtot[u] = s
    return vtot


def _move_sweep(g: CsrGraph, vcom: list[int], ctot: list[float], vaff: list[int],
                vcob: list[int] | None, vtot: list[float], M: float, R: float,
                L: int, E: float, refine: bool) -> int:
    """leidenMoveW / louvainMoveW (inc/leiden.hxx:583-601).

    ``vcob is None`` selects Louvain semantics (no refine ever). Returns the
    iteration count with the reference's exact return rule
    ``l>1 || el ? l : 0``.
    """
    indptr, dst, w = g.indptr, g.dst, g.w
    exists = g.exists
    span = g.span
    l = 0
    el = 0.0
    while l < L:
        el = 0.0
        for u in range(span):
            if not exists[u] or not vaff[u]:
                continue
            d = vcom[u]
            if refine and ctot[d] > vtot[u]:
                continue
            # scan communities: first-touch order (inc/leiden.hxx:412-419)
            vcs: list[int] = []
            vcout: dict[int, float] = {}
            bu = vcob[u] if refine else 0
            for i in range(indptr[u], indptr[u + 1]):
                v = dst[i]
                if u == v:
                    continue
                if refine and bu != vcob[v]:
                    continue
                c = vcom[v]
                if c in vcout:
                    vcout[c] += w[i]
                else:
                    vcs.append(c)
                    vcout[c] = w[i]
            # choose best community: strict >, first-scanned wins ties,
            # cmax starts at 0 => community 0 never a target
            # (inc/leiden.hxx:492-502)
            cmax = 0
            emax = 0.0
            vdout = vcout.get(d, 0.0)
            vt = vtot[u]
            ctd = ctot[d]
            for c in vcs:
                if c == d:
                    continue
                e = (vcout[c] - vdout) / M - R * vt * (vt + ctot[c] - ctd) / (2.0 * M * M)
                if e > emax:
                    emax = e
                    cmax = c
            if cmax:
                ctot[d] -= vt
                ctot[cmax] += vt
                vcom[u] = cmax
                for i in range(indptr[u], indptr[u + 1]):
                    vaff[dst[i]] = 1
            vaff[u] = 0
            el += emax
        if refine:
            break
        l += 1
        if el <= E:
            break
    return l if (l > 1 or el != 0.0) else 0


def _aggregate(g: CsrGraph, vcom: list[int], cn: int) -> CsrGraph:
    """Graph coarsening (inc/leiden.hxx:926-939): per community c in id
    order, scan all members' edges (members in ascending vertex id,
    inc/leiden.hxx:842-845) keeping self-loops (SELF=true), and emit
    super-edges in first-touch order.
    """
    members: list[list[int]] = [[] for _ in range(cn)]
    for u in g.vertices():
        members[vcom[u]].append(u)  # ascending-u scatter == cv CSR order
    indptr = [0] * (cn + 1)
    dsts: list[int] = []
    ws: list[float] = []
    for c in range(cn):
        vcs: list[int] = []
        vcout: dict[int, float] = {}
        for u in members[c]:
            for i in range(g.indptr[u], g.indptr[u + 1]):
                dc = vcom[g.dst[i]]
                if dc in vcout:
                    vcout[dc] += g.w[i]
                else:
                    vcs.append(dc)
                    vcout[dc] = g.w[i]
        for dc in vcs:  # insertion (first-touch) order preserved
            dsts.append(dc)
            ws.append(vcout[dc])
        indptr[c + 1] = len(dsts)
    return CsrGraph(cn, indptr, dsts, ws, [True] * cn)


def _renumber(g: CsrGraph, vcom: list[int]) -> int:
    """Order-preserving dense renumber (inc/leiden.hxx:707-716, 983-988):
    new id = rank of old community id among existing community ids."""
    seen = [0] * g.span
    for u in g.vertices():
        seen[vcom[u]] = 1
    rank = [0] * g.span
    r = 0
    for c in range(g.span):
        rank[c] = r
        r += seen[c]
    for u in g.vertices():
        vcom[u] = rank[vcom[u]]
    return r


def modularity(g: CsrGraph, membership: list[int], M: float, R: float = 1.0) -> float:
    """Q = sum_c [cin_c/(2M) - R*(ctot_c/(2M))^2] (inc/properties.hxx:123-126,
    177-192); cin/ctot from directed edge scan so each undirected edge counts
    twice."""
    cin: dict[int, float] = {}
    ctot: dict[int, float] = {}
    for u in g.vertices():
        c = membership[u]
        for i in range(g.indptr[u], g.indptr[u + 1]):
            d = membership[g.dst[i]]
            wt = g.w[i]
            if c == d:
                cin[c] = cin.get(c, 0.0) + wt
            ctot[c] = ctot.get(c, 0.0) + wt
    q = 0.0
    for c in sorted(ctot):  # ascending-c summation like modularityCommunities
        q += cin.get(c, 0.0) / (2.0 * M) - R * (ctot[c] / (2.0 * M)) ** 2
    return q


def leiden_exact(x: CsrGraph, options: LeidenOptions | None = None, refine: bool = True) -> KernelResult:
    """Sequential deterministic Leiden (``refine=True``) / Louvain
    (``refine=False``), replicating leidenInvoke / louvainInvoke
    (inc/leiden.hxx:1070-1178, inc/louvain.hxx:1010-1110)."""
    o = options or LeidenOptions()
    R = o.resolution
    L = o.max_iterations
    P = o.max_passes
    S = x.span
    M = x.total_weight() / 2.0
    E = o.tolerance

    vaff = [0] * S
    ucom = [0] * S
    vcom = [0] * S
    vcob = [0] * S
    utot = [0.0] * S
    vtot = [0.0] * S
    ctot = [0.0] * S

    # fi: vertex weights + singleton init (inc/leiden.hxx:1349-1352)
    uw = _vertex_weights(x)
    for u in x.vertices():
        utot[u] = uw[u]
        ucom[u] = u
        ctot[u] = utot[u]
    # fm: mark all (full span) affected (inc/leiden.hxx:1353-1355)
    for u in range(S):
        vaff[u] = 1

    l = 0
    p = 0
    pass_log: list[dict] = []
    y: CsrGraph | None = None
    if M > 0 and P > 0:
        while True:
            is_first = p == 0
            g = x if is_first else y
            com = ucom if is_first else vcom
            tot = utot if is_first else vtot
            m = _move_sweep(g, com, ctot, vaff, vcob, tot, M, R, L, E, refine=False)
            if refine:
                # refine phase (inc/leiden.hxx:1133-1142)
                for u in range(S):
                    vcob[u] = com[u]
                for u in g.vertices():
                    com[u] = u
                    ctot[u] = tot[u]
                # off-by-one quirk: mark only first order() slots
                n_mark = g.order
                for u in range(n_mark):
                    vaff[u] = 1
                m += _move_sweep(g, com, ctot, vaff, vcob, tot, M, R, L, E, refine=True)
            l += max(m, 1)
            p += 1
            pass_log.append({"pass": p, "move_iterations": m, "graph_order": g.order})
            if m <= 1 or p >= P:
                break
            gn = g.order
            cn_distinct = len({com[u] for u in g.vertices()})
            if float(cn_distinct) / gn >= o.aggregation_tolerance:
                break
            cn = _renumber(g, com)
            if not is_first:
                for u in range(S):
                    ucom[u] = vcom[ucom[u]]
            y = _aggregate(g, com, cn)
            vtot = [0.0] * max(S, cn)
            yw = _vertex_weights(y)
            vcom = [0] * max(S, cn)
            ctot_new = [0.0] * max(S, cn)
            vaff = [0] * max(S, cn)
            for u in range(cn):
                vtot[u] = yw[u]
                vcom[u] = u
                ctot_new[u] = vtot[u]
                vaff[u] = 1
            ctot = ctot_new
            vcob = [0] * max(S, cn)
            E /= o.tolerance_drop
        if p > 1:
            for u in range(S):
                ucom[u] = vcom[ucom[u]]

    q = modularity(x, ucom, M, R)
    ncomm = len({ucom[u] for u in x.vertices()})
    return KernelResult(membership=ucom, exists=list(x.exists), iterations=l, passes=p,
                        modularity=q, communities=ncomm, M=M, pass_log=pass_log)


def louvain_exact(x: CsrGraph, options: LeidenOptions | None = None) -> KernelResult:
    return leiden_exact(x, options, refine=False)


def communities_disconnected(g: CsrGraph, membership: list[int]) -> int:
    """Count internally-disconnected communities (inc/properties.hxx:379-401):
    BFS inside each community from its first member; disconnected if the BFS
    reaches fewer vertices than the community size."""
    comm_members: dict[int, list[int]] = {}
    for u in g.vertices():
        comm_members.setdefault(membership[u], []).append(u)
    bad = 0
    for c, mem in comm_members.items():
        if len(mem) <= 1:
            continue
        memset = set(mem)
        seen = {mem[0]}
        frontier = [mem[0]]
        while frontier:
            nxt = []
            for u in frontier:
                for i in range(g.indptr[u], g.indptr[u + 1]):
                    v = g.dst[i]
                    if v in memset and v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
        if len(seen) < len(mem):
            bad += 1
    return bad
