"""Distributed Leiden/Louvain (scale mode) — idiomatic PySpark.

This is the 100 TB path. Exact-label parity with the reference is the job of
the deterministic-match kernel (operators/kernel.py); this module preserves
the *pass-level contract* of the reference pipeline
(inc/leiden.hxx:1192-1305):

- tolerance schedule: E = 1e-2, E /= 10 per pass (inc/leiden.hxx:1295)
- round convergence when the gain l1-norm <= E (inc/leiden.hxx:1228)
- refinement: singleton re-init + one constrained sweep bounded by the
  local-move result (inc/leiden.hxx:1259-1268)
- aggregation-tolerance early exit CN/GN >= 0.8 (inc/leiden.hxx:1271-1275)
- order-preserving dense renumbering (inc/leiden.hxx:1276-1277)
- dendrogram flattening ucom[u] = vcom[ucom[u]] (inc/leiden.hxx:1278-1279)
- max 20 move rounds / pass, max 10 passes (inc/leiden.hxx:62)

Three move-phase execution strategies, chosen per pass:

1. ``sweep`` (default while the graph is big): partitioned Gauss-Seidel —
   edges range-partitioned into contiguous degree-balanced vertex-id blocks
   (CSR-style adjacency partitions; web link graphs and every renumbered
   super-graph have id locality, so most neighborhoods are partition-local),
   one ``mapInPandas`` job per coarse round sweeping every partition against
   a broadcast state snapshot (operators/sweep.py, C-accelerated hot loop in
   operators/_ckernel.py). The Spark analogue of the reference's per-thread
   async loop (inc/leiden.hxx:646-668).
2. ``rounds``: pure-DataFrame bulk-synchronous rounds (A4 join-agg + argmax
   via max_by). Unbounded state (no broadcast), one shuffle chain per round;
   the fallback beyond ~10^9 vertices, and the reference plan for the
   correctness-gated operator queries.
3. driver fast path: once the aggregated graph fits trivially in the driver
   (late passes — super-graphs shrink geometrically), finish with the
   deterministic kernel. Mirrors the reference's own switch from DiGraph to
   packed CSR after pass 1 (inc/leiden.hxx:1249-1250).

Physical design per sweep round: the only big relation (edges) is shuffled
ONCE per pass (range repartition, then reused persisted, int32/float32
transport when ids fit); each round ships O(|V|) broadcast state out and
O(net movers) rows back, with rounds after a small frontier aff-seeded so
the in-task work is O(frontier). Per-pass driver state (vtot) is carried
from the previous pass's community weights instead of recomputed. Degree
skew is handled by degree-balanced range cuts; giant-community aggregation
skew by AQE (the groupBy(cs,cd) shuffle).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .kernel import CsrGraph, LeidenOptions, leiden_exact
from .sweep import DriverState, sweep_partition

_MOVES_SCHEMA = "id long, community_new long, gain double"

_PART_LABELS: dict[int, list[int]] = {}


def _partition_labels(spark: SparkSession, p: int) -> list[int]:
    """For each target partition i in 0..p-1, a long label L_i with
    ``pmod(hash(L_i), p) == i`` under Spark's Murmur3 ``hash``. Tagging each
    edge with the label of its range bucket and hash-repartitioning on the
    tag places bucket i exactly in partition i — explicit, deterministic
    range placement through the stock HashPartitioning (no sampling, so
    results are bit-identical across core counts, unlike
    ``repartitionByRange`` whose reservoir-sampled boundaries may shift with
    upstream parallelism)."""
    if p not in _PART_LABELS:
        rows = (
            spark.range(0, 64 * p)
            .select(F.col("id"), F.pmod(F.hash(F.col("id")), F.lit(p)).alias("h"))
            .groupBy("h").agg(F.min("id").alias("label"))
            .collect()
        )
        by_h = {int(r["h"]): int(r["label"]) for r in rows}
        assert len(by_h) == p, f"hash label search incomplete: {len(by_h)}/{p}"
        _PART_LABELS[p] = [by_h[i] for i in range(p)]
    return _PART_LABELS[p]


def _range_partition_edges(spark: SparkSession, g: DataFrame, vid, weight, p: int,
                           narrow: bool = True) -> DataFrame:
    """CSR-style adjacency partitions: contiguous vertex-id ranges with
    ~equal total degree per partition. Web link graphs (and every renumbered
    super-graph) have strong id locality, so range placement keeps most of a
    vertex's neighborhood partition-local — the partition sweep then runs
    fresh Gauss-Seidel instead of damped stale rounds. Boundaries come from
    the driver's exact degree-cumsum percentiles (deterministic), applied as
    a pure column expression (a P-way CASE over the cut ids — no join).

    ``narrow``: ship (src,dst) as int32 and w as float32 through the
    Arrow feed when ids fit — halves the per-round executor transfer. The
    float32 edge weight matches the reference's TYPE=float input width
    (main.cxx:16-19); all accumulation stays float64 in the kernel."""
    import numpy as np

    vid = np.asarray(vid, dtype=np.int64)
    cum = np.cumsum(weight)
    total = float(cum[-1]) if len(cum) else 0.0
    targets = np.linspace(0, total, p + 1)[1:-1]
    bounds_idx = np.searchsorted(cum, targets)       # vid index upper bounds
    cuts = vid[np.minimum(bounds_idx, max(len(vid) - 1, 0))] if len(vid) else []
    labels = _partition_labels(spark, p)
    expr = F.lit(labels[p - 1])
    for i in range(p - 2, -1, -1):                   # src < cuts[i] → bucket i
        expr = F.when(F.col("src") < int(cuts[i]), F.lit(labels[i])).otherwise(expr)
    cols = [F.col("src"), F.col("dst"), F.col("w")]
    if narrow and len(vid) and int(vid[-1]) < 2**31 - 1:
        cols = [F.col("src").cast("int"), F.col("dst").cast("int"),
                F.col("w").cast("float")]
    return (
        g.select(*cols, expr.alias("_part"))
        .repartition(p, "_part").drop("_part")
        .sortWithinPartitions("src", "dst")
    )


@dataclass
class LeidenRunResult:
    membership: DataFrame                  # (id: long, community: long)
    modularity: float
    passes: int
    iterations: int
    M: float
    metrics: list[dict] = field(default_factory=list)


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage inside iterative loops: an eager localCheckpoint keeps
    each round's plan O(1) instead of O(rounds). On a cluster this is a
    reliable checkpoint / shuffle-reuse point."""
    return df.localCheckpoint(eager=True)


def vertex_weights(edges: DataFrame) -> DataFrame:
    """A2 (inc/leiden.hxx:216-224): vtot[u] = Σ incident weights (self-loops
    included)."""
    return edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("vtot"))


def community_weights(memb: DataFrame, vtot: DataFrame) -> DataFrame:
    """A3 (inc/leiden.hxx:252-263): ctot[c] = Σ member vtot."""
    return memb.join(vtot, "id").groupBy("community").agg(F.sum("vtot").alias("ctot"))


def modularity_df(edges: DataFrame, memb: DataFrame, M: float, resolution: float = 1.0) -> float:
    """A14 (inc/properties.hxx:205-233): Q = Σ_c cin/(2M) − R·(ctot/(2M))²
    over the directed edge scan (each undirected edge twice)."""
    ms = memb.select(F.col("id").alias("src"), F.col("community").alias("cs"))
    md = memb.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
    per_comm = (
        edges.join(ms, "src").join(md, "dst")
        .groupBy("cs")
        .agg(
            F.sum(F.when(F.col("cs") == F.col("cd"), F.col("w")).otherwise(0.0)).alias("cin"),
            F.sum("w").alias("ctot"),
        )
    )
    row = per_comm.select(
        F.sum(F.col("cin") / (2.0 * M) - resolution * F.pow(F.col("ctot") / (2.0 * M), F.lit(2.0))).alias("q")
    ).collect()[0]
    return float(row["q"] or 0.0)


_BROADCAST_VERTEX_LIMIT = 2_000_000   # rows; above this a per-task hash
                                      # build costs more than a shuffle join


def _maybe_broadcast(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint small relabel maps; past the limit let AQE plan the
    join (sort-merge / shuffled-hash with skew handling)."""
    if n_rows is not None and n_rows <= _BROADCAST_VERTEX_LIMIT:
        return F.broadcast(df)
    return df


def _compose(outer: DataFrame, inner: DataFrame, n_inner: int | None = None) -> DataFrame:
    """Dendrogram flattening R3 (inc/leiden.hxx:898-904):
    outer.community := inner[outer.community]."""
    m = _maybe_broadcast(
        inner.select(F.col("id").alias("community"), F.col("community").alias("cnew")),
        n_inner)
    return outer.join(m, "community").select("id", F.col("cnew").alias("community"))


def _move_round(edges: DataFrame, memb: DataFrame, vtot: DataFrame, ctot: DataFrame,
                M: float, R: float, aff: DataFrame | None = None,
                bound: DataFrame | None = None, refine: bool = False) -> DataFrame:
    """One bulk-synchronous local-move round (``rounds`` strategy) → moves
    (id, community_new, gain): strictly-positive-gain argmax over scanned
    communities (L1+L2: inc/properties.hxx:253-256, inc/leiden.hxx:492-502)
    against the round-start snapshot; ties broken by smallest target id."""
    ms = memb.select(F.col("id").alias("src"), F.col("community").alias("d"))
    md = memb.select(F.col("id").alias("dst"), F.col("community").alias("cd"))

    e = edges.filter(F.col("src") != F.col("dst"))  # scan skips self (inc/leiden.hxx:414)
    if aff is not None:
        e = e.join(aff.select(F.col("id").alias("src")), "src", "left_semi")
    if refine and bound is not None:
        bs = bound.select(F.col("id").alias("src"), F.col("bound").alias("bs"))
        bd = bound.select(F.col("id").alias("dst"), F.col("bound").alias("bd"))
        e = e.join(bs, "src").join(bd, "dst").filter(F.col("bs") == F.col("bd")).drop("bs", "bd")

    vcout = e.join(md, "dst").groupBy("src", "cd").agg(F.sum("w").alias("vcout"))  # A4
    cand = (
        vcout.join(ms, "src")
        .join(vtot.select(F.col("id").alias("src"), "vtot"), "src")
        .join(F.broadcast(ctot.select(F.col("community").alias("cd"), F.col("ctot").alias("ctot_c"))), "cd")
        .join(F.broadcast(ctot.select(F.col("community").alias("d"), F.col("ctot").alias("ctot_d"))), "d")
    )
    vdout = (
        vcout.join(ms, "src").filter(F.col("cd") == F.col("d"))
        .select("src", F.col("vcout").alias("vdout"))
    )
    cand = cand.join(vdout, "src", "left").na.fill({"vdout": 0.0})
    if refine:
        cand = cand.filter(F.col("ctot_d") <= F.col("vtot"))  # singleton source (inc/leiden.hxx:590)

    gain = (
        (F.col("vcout") - F.col("vdout")) / F.lit(M)
        - F.lit(R) * F.col("vtot") * (F.col("vtot") + F.col("ctot_c") - F.col("ctot_d")) / F.lit(2.0 * M * M)
    )
    scored = (
        cand.filter(F.col("cd") != F.col("d"))
        .withColumn("gain", gain).filter(F.col("gain") > 0)
    )
    return scored.groupBy("src").agg(
        F.expr("max_by(cd, struct(gain, -cd))").alias("community_new"),
        F.max("gain").alias("gain"),
    ).select(F.col("src").alias("id"), "community_new", "gain")


# ---------------------------------------------------------------------------
# scale-mode driver loop
# ---------------------------------------------------------------------------

def leiden_scale(spark: SparkSession, edges: DataFrame, options: LeidenOptions | None = None,
                 refine: bool = True, checkpointer=None, verbose: bool = False,
                 num_partitions: int = 32, local_iters: int = 20,
                 driver_threshold: int = 50000,
                 driver_vertex_threshold: int = 20000,
                 frontier_threshold: float = 0.0) -> LeidenRunResult:
    """Distributed Leiden (``refine=True``) / Louvain (``refine=False``).

    ``edges`` must be symmetric and deduplicated (sources/edges.py).
    ``num_partitions`` fixes the sweep partitioning (determinism across core
    counts). ``driver_threshold``: aggregated graphs at or below this many
    edge rows finish on the driver with the deterministic kernel.
    ``checkpointer``: plans.checkpoint.CheckpointManager for per-super-step
    persistence + resume.
    """
    o = options or LeidenOptions()
    R = o.resolution
    metrics: list[dict] = []

    t_setup = time.time()
    edges0 = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.col("w").cast("double")).persist()
    M = float(edges0.agg(F.sum("w")).collect()[0][0] or 0.0) / 2.0  # A1 (main.cxx:61)
    metrics.append({"phase": "setup", "seconds": round(time.time() - t_setup, 3)})
    if M <= 0:
        empty = spark.createDataFrame([], "id long, community long")
        return LeidenRunResult(empty, 0.0, 0, 0, 0.0, [])

    sc = spark.sparkContext
    g = edges0
    ucom: DataFrame | None = None
    total_iters = 0
    p = 0
    E = o.tolerance

    if checkpointer is not None:
        resumed = checkpointer.latest(spark)
        if resumed is not None:
            p, ucom, g, E, total_iters, metrics = resumed
            ucom = _materialize(ucom)
            g = _materialize(g)
            if verbose:
                print(f"[leiden_scale] resumed at pass={p}")

    n_vertices: int | None = None
    carried: tuple | None = None        # (vid, vtot) for passes ≥ 2
    if checkpointer is not None and p > 0:
        # restore the strategy-selection state so a resumed run takes the
        # same execution path (and thus produces identical labels)
        n_vertices = g.select("src").distinct().count()
    while True:
        t0 = time.time()
        n_edges = g.count()

        # ---- driver fast path: finish small super-graphs with the kernel ----
        # (few edges, or few vertices — dense coarsened graphs converge far
        # faster under the sequential kernel than under bounded sync rounds)
        if n_edges <= driver_threshold or (
                n_vertices is not None and n_vertices <= driver_vertex_threshold):
            pdf = g.toPandas()
            vid = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
            src_i = np.searchsorted(vid, pdf["src"].to_numpy())
            dst_i = np.searchsorted(vid, pdf["dst"].to_numpy())
            triples = sorted(zip(src_i.tolist(), dst_i.tolist(), pdf["w"].tolist()))
            csr = CsrGraph.__new__(CsrGraph)
            indptr = [0] * (len(vid) + 1)
            dsts, ws = [], []
            j = 0
            for u in range(len(vid)):
                while j < len(triples) and triples[j][0] == u:
                    dsts.append(triples[j][1]); ws.append(triples[j][2]); j += 1
                indptr[u + 1] = len(dsts)
            csr.span, csr.indptr, csr.dst, csr.w = len(vid), indptr, dsts, ws
            csr.exists = [True] * len(vid)
            sub = leiden_exact(csr, LeidenOptions(
                resolution=R, tolerance=E, aggregation_tolerance=o.aggregation_tolerance,
                tolerance_drop=o.tolerance_drop, max_iterations=o.max_iterations,
                max_passes=max(o.max_passes - p, 1)), refine=refine)
            memb_rows = [(int(vid[i]), int(sub.membership[i])) for i in range(len(vid))]
            memb_df = spark.createDataFrame(memb_rows, "id long, community long")
            ucom = _materialize(memb_df if ucom is None else _compose(ucom, memb_df, len(memb_rows)))
            total_iters += sub.iterations
            p += sub.passes
            metrics.append({"pass": p, "strategy": "driver-kernel",
                            "vertices": len(vid), "edges": int(n_edges),
                            "kernel_passes": sub.passes,
                            "pass_seconds": round(time.time() - t0, 3)})
            if verbose:
                print(f"[leiden_scale] driver-kernel finish: +{sub.passes} passes "
                      f"({time.time() - t0:.1f}s)")
            break

        # ---- distributed pass (sweep strategy) ----
        t_ph = time.time()
        if carried is None:
            # A2 from the edge table (first pass / resume)
            vt = (
                g.groupBy("src")
                .agg(F.sum("w").alias("vtot"), F.count(F.lit(1)).alias("deg"))
                .toPandas().sort_values("src")
            )
            vid_arr = vt["src"].to_numpy(np.int64)
            vtot_arr = vt["vtot"].to_numpy()
            bal = vt["deg"].to_numpy(np.float64)
        else:
            # passes ≥ 2: the super-vertex weight IS the previous pass's
            # community weight (Σ member vtot, self-loops included) — the
            # driver already holds it, no Spark job needed
            vid_arr, vtot_arr = carried
            bal = vtot_arr
        t_vt = time.time() - t_ph
        state = DriverState(vid_arr, vtot_arr)
        t_ph = time.time()
        part_edges = _range_partition_edges(
            spark, g, state.vid, bal, num_partitions
        ).persist()
        part_edges.count()                     # materialize the pass shuffle
        t_part = time.time() - t_ph
        gn = len(state.vid)

        def run_sweep(st_dict, refine_flag, E_cur, direction=0, feed=None):
            # the in-task sweep sees ~1/P of the graph, so its share of the
            # global gain budget is E/P — a task that compares its local
            # gain sum to the GLOBAL E quits ~P× too early and pushes the
            # convergence work into many more (expensive) coarse rounds
            E_task = E_cur / max(num_partitions, 1)
            bc = sc.broadcast(st_dict)
            try:
                out = (feed if feed is not None else part_edges).mapInPandas(
                    lambda it: sweep_partition(it, bc.value, M, R, E_task,
                                               1 if refine_flag else local_iters,
                                               refine_flag, direction),
                    schema=_MOVES_SCHEMA,
                ).toPandas()
            finally:
                bc.destroy()
            return out

        def frontier_feed(mover_ids):
            """JVM-side frontier cut for aff-seeded rounds: ship through
            Arrow only the full adjacency of vertices with a moved
            neighbor. Broadcast semi-joins are map-side filters, so the
            range-bucket partitioning and (src,dst) order are preserved —
            the sweep task contract is unchanged, just on O(frontier)
            rows. At 100 TB this is what makes late rounds ~free."""
            import pandas as pd
            mv = spark.createDataFrame(
                pd.DataFrame({"dst": np.asarray(mover_ids, dtype="int64")}))
            aff = (
                part_edges.join(F.broadcast(mv), "dst", "left_semi")
                .select("src").distinct()
            )
            return part_edges.join(F.broadcast(aff), "src", "left_semi")

        move_iters = 0
        t_move0 = time.time()
        el_prev = float("inf")
        round_log: list[dict] = []
        changed_pos = None            # previous round's movers → aff seed
        prev_sigs: list[tuple] = []   # limit-cycle detection (period ≤ 2)
        for rnd in range(o.max_iterations):
            # alternate move direction across coarse rounds to break
            # cross-partition swap cycles (see sweep_partition docstring);
            # a single partition has no stale state and sweeps freely
            direction = 0 if num_partitions <= 1 else (-1 if rnd % 2 == 0 else 1)
            t_rnd = time.time()
            snap = state.snapshot()
            feed = None
            if changed_pos is not None and len(changed_pos):
                snap["changed_pos"] = changed_pos
                # JVM-side frontier cut only below the threshold fraction:
                # in local mode the full Arrow feed of a cached table beats
                # the semi-join machinery, so this defaults off (0.0); on a
                # real cluster with larger tables-per-core it pays
                if len(changed_pos) < frontier_threshold * gn:
                    feed = frontier_feed(state.vid[changed_pos])
            out = run_sweep(snap, False, E, direction, feed=feed)
            move_iters += 1
            if len(out):
                pos = state.pos(out["id"].to_numpy(np.int64))
                state.comm[pos] = out["community_new"].to_numpy(np.int64)
                state.recompute_ctot()
                # aff-seed the next round only when the frontier is small:
                # a big mover set needs a full re-equilibration round (frontier
                # waves otherwise keep el hovering at the tolerance), while a
                # small one makes the next round O(frontier) — the 100 TB tail
                changed_pos = pos if len(out) < 0.02 * gn else None
            else:
                changed_pos = np.empty(0, dtype=np.int64)
            el = float(out["gain"].sum()) if len(out) else 0.0
            round_log.append({"seconds": round(time.time() - t_rnd, 2),
                              "movers": int(len(out)), "el": round(el, 6)})
            # a direction-constrained round sees only half the move space, so
            # convergence needs two consecutive below-tolerance rounds; a
            # tiny-churn stop bounds synchronous label noise that never
            # crosses E (the async reference has no such noise floor); a
            # repeated (movers, gain, id-sum) signature means a period-≤2
            # limit cycle that will never descend below E — stop
            sig = (len(out), round(el, 10),
                   int(out["id"].sum()) if len(out) else 0)
            cycle = sig in prev_sigs
            prev_sigs = (prev_sigs + [sig])[-2:]
            tiny = len(out) <= max(8, gn // 2000)
            if len(out) == 0 or tiny or cycle or (el <= E and (direction == 0 or el_prev <= E)):
                break
            el_prev = el
        t_move = time.time() - t_move0

        t_ref0 = time.time()
        t_ref_job = t_ref_apply = 0.0
        if refine:
            bound = state.comm.copy()
            state.comm = state.vid.copy()          # singleton re-init
            state.ctot = state.vtot.copy()
            out = run_sweep(state.snapshot(bound), True, E)
            t_ref_job = time.time() - t_ref0
            if len(out):
                # sequential acceptance in ascending id order replicates the
                # source-still-singleton check (inc/leiden.hxx:536-548);
                # positions pre-resolved vectorized, loop on plain lists
                out = out.sort_values("id")
                ids = state.pos(out["id"].to_numpy(np.int64)).tolist()
                tgt_ids = out["community_new"].to_numpy(np.int64)
                tps = state.pos(tgt_ids).tolist()
                tgts = tgt_ids.tolist()
                dps = state.pos(state.comm[ids]).tolist()
                ctot_l = state.ctot.tolist()
                vtot_l = state.vtot.tolist()
                comm_l = state.comm.tolist()
                for k in range(len(ids)):
                    up = ids[k]
                    uv = vtot_l[up]
                    dp = dps[k]
                    if ctot_l[dp] > uv:
                        continue
                    cp = tps[k]
                    ctot_l[dp] -= uv
                    ctot_l[cp] += uv
                    comm_l[up] = tgts[k]
                state.comm = np.asarray(comm_l, dtype=np.int64)
                state.ctot = np.asarray(ctot_l, dtype=np.float64)
            t_ref_apply = time.time() - t_ref0 - t_ref_job
        t_ref = time.time() - t_ref0

        total_iters += max(move_iters, 1)
        p += 1
        cn = state.n_communities()
        rec = {"pass": p, "strategy": "sweep", "move_iterations": move_iters,
               "vertices": gn, "communities": cn, "edges": int(n_edges),
               "tolerance": E, "move_seconds": round(t_move, 3),
               "refine_seconds": round(t_ref, 3),
               "refine_job_seconds": round(t_ref_job, 3),
               "refine_apply_seconds": round(t_ref_apply, 3),
               "vt_seconds": round(t_vt, 3),
               "partition_seconds": round(t_part, 3),
               "rounds": round_log,
               "pass_seconds": round(time.time() - t0, 3)}
        metrics.append(rec)
        if verbose:
            print(f"[leiden_scale] pass={p} sweep iters={move_iters} GN={gn} CN={cn} "
                  f"E={E:g} (move={t_move:.1f}s refine={t_ref:.1f}s total={time.time() - t0:.1f}s)")

        # renumber dense, order-preserving (R2)
        t_ren = time.time()
        uniq = np.unique(state.comm)
        dense = np.searchsorted(uniq, state.comm)
        import pandas as pd
        memb_df = spark.createDataFrame(pd.DataFrame(
            {"id": state.vid.astype("int64"), "community": dense.astype("int64")}))
        n_vertices = int(uniq.size)  # next pass's vertex count
        # next pass's dense vertex universe + carried vertex weights
        carried = (np.arange(uniq.size, dtype=np.int64),
                   state.ctot[state.pos(uniq)].copy())
        ucom = _materialize(memb_df if ucom is None else _compose(ucom, memb_df, gn))
        rec["renumber_seconds"] = round(time.time() - t_ren, 3)

        stop = move_iters <= 1 or p >= o.max_passes or float(cn) / gn >= o.aggregation_tolerance
        if stop:
            part_edges.unpersist()
            break

        # aggregate (A9): relabel both endpoints, sum — self-loops kept
        t_agg = time.time()
        ms = _maybe_broadcast(
            memb_df.select(F.col("id").alias("src"), F.col("community").alias("cs")), gn)
        md = _maybe_broadcast(
            memb_df.select(F.col("id").alias("dst"), F.col("community").alias("cd")), gn)
        g = _materialize(
            part_edges.join(ms, "src").join(md, "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        part_edges.unpersist()
        rec["aggregate_seconds"] = round(time.time() - t_agg, 3)
        E /= o.tolerance_drop
        if checkpointer is not None:
            checkpointer.save(p, ucom, g, E, total_iters, metrics)

    t_q = time.time()
    q = modularity_df(edges0, ucom, M, R)
    metrics.append({"phase": "final_modularity", "seconds": round(time.time() - t_q, 3)})
    edges0.unpersist()
    return LeidenRunResult(ucom, q, p, total_iters, M, metrics)


def louvain_scale(spark: SparkSession, edges: DataFrame, options: LeidenOptions | None = None,
                  checkpointer=None, verbose: bool = False, **kw) -> LeidenRunResult:
    """Louvain ablation = Leiden minus refinement (inc/louvain.hxx:1010-1110)."""
    return leiden_scale(spark, edges, options, refine=False,
                        checkpointer=checkpointer, verbose=verbose, **kw)
