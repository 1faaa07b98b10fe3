"""Graph analytics (SURVEY.md §7 phase 3 — the project north star).

The reference has no analytics operators (its splits API, TikvTable.java:
284-336, exists precisely so OLAP engines like Spark can scan the graph in
parallel and do this work).  These are GraphX-style algorithms re-expressed
as DataFrame programs: aggregate-messages = groupBy on message destination;
iterative algorithms cut lineage with localCheckpoint.

Scale posture: every iteration is a self-join on the edge table.  For a
100 TB graph, persist `edges` as the dual bucketed layout
(sources/edge_layout.py) and pass the by-src copy in — pagerank's
out-degree aggregate and per-iteration contribution join both key on `src`,
so they run exchange-free on that copy (tests/test_plans.py pins the plan);
AQE handles skewed hub vertices (skew-join splitting).  Degrees/messages
use map-side partial aggregation natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree, degree) for every vertex appearing in an
    edge.  Endpoint-explode + ONE partial-aggregated groupBy — half the
    shuffles of the groupBy-per-direction + outer-join formulation."""
    endpoints = edges.select(
        F.col("src").alias("id"), F.lit(1).alias("is_out"), F.lit(0).alias("is_in")
    ).unionByName(
        edges.select(F.col("dst").alias("id"), F.lit(0).alias("is_out"), F.lit(1).alias("is_in"))
    )
    return endpoints.groupBy("id").agg(
        F.sum("is_out").alias("out_degree"),
        F.sum("is_in").alias("in_degree"),
        F.count(F.lit(1)).alias("degree"),
    )


def aggregate_messages(edges: DataFrame, vertices: DataFrame | None,
                       msg_to_dst: Column | None = None,
                       msg_to_src: Column | None = None,
                       agg: Column | None = None) -> DataFrame:
    """GraphX aggregateMessages on DataFrames: evaluate message expressions
    over edge (+ joined vertex attrs when `vertices` given), fan them to the
    named endpoint, and aggregate per receiving vertex.

    `msg_to_dst`/`msg_to_src` are Column expressions over the (joined) edge
    row; `agg` aggregates column "msg" (default sum)."""
    agg = agg if agg is not None else F.sum("msg")
    e = edges
    if vertices is not None:
        src_v = vertices.select([F.col(c).alias(f"src_{c}") for c in vertices.columns])
        dst_v = vertices.select([F.col(c).alias(f"dst_{c}") for c in vertices.columns])
        e = (
            e.join(src_v, e.src == F.col("src_id"), "left")
            .join(dst_v, e.dst == F.col("dst_id"), "left")
        )
    parts = []
    if msg_to_dst is not None:
        parts.append(e.select(F.col("dst").alias("id"), msg_to_dst.alias("msg")))
    if msg_to_src is not None:
        parts.append(e.select(F.col("src").alias("id"), msg_to_src.alias("msg")))
    if not parts:
        raise ValueError("at least one of msg_to_dst/msg_to_src required")
    msgs = parts[0]
    for p in parts[1:]:
        msgs = msgs.unionByName(p)
    return msgs.groupBy("id").agg(agg.alias("agg_msg"))


def pagerank(edges: DataFrame, iterations: int = 10, reset: float = 0.15,
             checkpoint_every: int = 3, broadcast_ranks: bool | None = None,
             state_partitions: int | None = None,
             broadcast_max_vertices: int = 2_000_000,
             teleport_ids=None, weight_col: str | None = None,
             tol: float | None = None, init_ranks: DataFrame | None = None,
             _iters_out: list | None = None) -> DataFrame:
    """Standard damped PageRank over the directed edge list; dangling mass is
    NOT redistributed (matches GraphX's default behavior).  Returns
    (id, rank).  Ranks start at 1.0 per vertex.

    `teleport_ids` (a small seed sequence) switches to PERSONALIZED
    PageRank: the reset mass lands only on the seed set (teleport vector =
    1.0 on seeds, 0 elsewhere — the unnormalized convention matching the
    global form's all-ones start), so ranks measure proximity to the seeds.
    Same iteration plan, one extra literal isin column; the seed list is a
    query parameter, not data (point-lookup scale, like the multi-id
    lookups).

    `weight_col` switches to WEIGHTED PageRank: contributions ship
    rank·w/Σ_out w instead of rank/out_degree (NULL weights count as 1.0,
    so partially-weighted edge views behave sensibly).  Identical plan
    shape — the normalization aggregate sums weights instead of counting
    rows; the unweighted path keeps its exact count-based arithmetic.

    Each iteration: contributions = rank/out_degree shipped along edges,
    grouped by dst (one shuffle per iteration on the same key → a cluster
    run pre-buckets edges by src to make the contribution join co-located).

    `init_ranks` (opt-in, (id, rank)) warm-starts the iteration from a
    previous run's output — the incremental path after an edge delta:
    combined with `tol`, re-convergence over a slightly-changed graph
    takes a fraction of the cold rounds (power iteration contracts toward
    the new fixpoint from wherever it starts, so the answer is unchanged;
    only the round count moves).  New vertices fall back to the cold
    value; departed vertices' stale entries drop out in the join.

    `tol` (opt-in) adds convergence early-exit: on the checkpoint cadence
    the max |Δrank| since the previous checkpoint is probed (one max-abs
    aggregate over the already-checkpointed state — the same probe shape as
    connected_components' change check), and iteration stops once it falls
    under tol.  The default (None) keeps the exact fixed-iteration plan for
    oracle determinism; at 100× scale a fixed count either wastes rounds or
    under-converges, so production runs pass tol.  `_iters_out`, when a
    list, receives the executed iteration count (test/telemetry hook).

    broadcast_ranks=None (the default) auto-decides from the vertex count:
    under broadcast_max_vertices the rank vector ships to every task so the
    edge side never shuffles (measured 5.4 → 4.6s warm / 10.6 → 6.6s cold
    at sf0.1); past it the contribution join shuffles on src, which a
    bucketed-by-src edge table makes co-located.  Explicit True/False
    overrides the heuristic.  The default threshold (2M rows ≈ tens of MB
    of (id, rank) pairs) is sized so the broadcast relation stays well
    under a 1g driver / modest-executor heap — comparable to
    autoBroadcastJoinThreshold territory, NOT "whatever fits on a big
    cluster"; raise it explicitly on beefier deployments.
    """
    # state_partitions sizes every iteration's shuffle to the rank-state
    # scale instead of the session default: per-task fixed costs dominate
    # iterative jobs when partitions are oversized (measured 2.3x at sf0.1
    # with 32→8).  Sizing is PLAN-LEVEL — explicit repartition(n, key) on the
    # iteration state, which Catalyst recognizes as satisfying the join/agg
    # distribution so no extra exchange is inserted — never a session-conf
    # override (which would race concurrent queries on the same session).
    # materialize the iteration-invariant state ONCE: vertex set and the
    # out-degree-normalized edge list (src, dst, out_degree).  Without this
    # every iteration's plan re-reads and re-unions the raw edge sources.
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if state_partitions:
        verts = verts.repartition(state_partitions, "id")
    verts = verts.persist()
    if weight_col is None:
        out_deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree"))
        e_sel = edges.select("src", "dst")
    else:
        w = F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
        out_deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.sum(w).alias("out_degree"))
        e_sel = edges.select("src", "dst", w.alias("_w"))
    norm_edges = (
        e_sel
        .join(out_deg.withColumnRenamed("id", "src"), "src")
    )
    if state_partitions:
        norm_edges = norm_edges.repartition(state_partitions, "src")
    norm_edges = norm_edges.persist()
    if broadcast_ranks is None:
        # verts is persisted and needed immediately anyway; the count is one
        # cheap job against the cached state
        broadcast_ranks = verts.count() <= broadcast_max_vertices
    try:
        # broadcast_ranks=True ships the rank vector to every task so the edge
        # scan never shuffles — the right plan while |V| fits in an executor
        # (hundreds of millions of rows at typical executor memory).  Beyond
        # that, leave False: the join shuffles on src, which a bucketed-by-src
        # edge table makes co-located.
        def tele_of(col: Column) -> Column:
            # teleport vector as a function of an arbitrary id column: the
            # iteration needs it on "id" AND (r11) on the edge side's "src"
            # for the left-join fill below
            if teleport_ids is not None:
                return (F.when(col.isin([int(v) for v in teleport_ids]),
                               F.lit(1.0)).otherwise(F.lit(0.0)))
            return F.lit(1.0)

        tele = tele_of(F.col("id"))
        # init_ranks (opt-in) warm-starts the iteration from a previous
        # run's ranks — the incremental-recompute path after an edge
        # delta: with tol= set, a warm start over a slightly-changed graph
        # converges in a fraction of the cold rounds (the power iteration
        # contracts toward the new fixpoint from wherever it starts, so
        # correctness is unchanged — only the round count moves).  Vertices
        # absent from init_ranks (newly added) fall back to the cold-start
        # value; departed vertices' stale entries are dropped by the join.
        if init_ranks is None:
            ranks = verts.withColumn("rank", tele)
        else:
            ranks = (verts.join(
                init_ranks.select("id", F.col("rank").alias("_ir")),
                "id", "left")
                .select("id", F.coalesce(F.col("_ir"), tele).alias("rank")))
        prev_ck = None
        iters_done = 0
        for i in range(iterations):
            iters_done = i + 1
            rank_side = ranks.withColumnRenamed("id", "src")
            if broadcast_ranks:
                rank_side = F.broadcast(rank_side)
            elif state_partitions:
                rank_side = rank_side.repartition(state_partitions, "src")
            # r11 (guide §2.4): from iteration 2 on, the rank state only
            # covers vertices WITH in-edges (the contribution aggregation's
            # key set) — an out-only vertex's rank is the constant
            # reset·tele, so the contribution join goes LEFT with that
            # constant as the fill, and the per-iteration `verts ⟕ contribs`
            # completion join (one vertex-scale join × iterations) is gone;
            # the full vertex domain is restored ONCE after the loop.
            # Bit-exact: old ranks for out-only v were
            # reset·tele + (1−reset)·0.0 ≡ reset·tele (IEEE: x + 0.0 = x,
            # (1−reset)·0.0 = +0.0), the same double the fill supplies.
            rank_eff = F.coalesce(F.col("rank"),
                                  F.lit(reset) * tele_of(F.col("src")))
            contrib_expr = (rank_eff / F.col("out_degree")
                            if weight_col is None else
                            rank_eff * F.col("_w") / F.col("out_degree"))
            contribs = (
                norm_edges.join(rank_side, "src", "left")
                .select(F.col("dst").alias("id"), contrib_expr.alias("contrib"))
            )
            if state_partitions:
                contribs = contribs.repartition(state_partitions, "id")
            ranks = (
                contribs.groupBy("id")
                .agg(F.sum("contrib").alias("contrib"))
                .select(
                    "id",
                    (F.lit(reset) * tele
                     + F.lit(1.0 - reset) * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
                )
            )
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                # r12 (guide §1.2 action budget): with no tolerance probe
                # there is nothing to LOOK at between iterations — the
                # in-loop checkpoints still cut lineage when materialized,
                # so they can all ride the final action instead of paying
                # one eager driver round trip each (5 actions → 1 for the
                # 10-iteration flagship).  Single-reference chain, so no
                # lineage doubling (the node2vec failure mode).  With
                # tol set, the delta probe needs each checkpoint NOW —
                # keep those eager.
                ranks = ranks.localCheckpoint(eager=tol is not None)
                if tol is not None:
                    if prev_ck is not None:
                        delta = (ranks.alias("n")
                                 .join(prev_ck.alias("o"), "id")
                                 .agg(F.max(F.abs(
                                     F.col("n.rank") - F.col("o.rank")))
                                     .alias("d")).collect()[0]["d"])
                        if delta is not None and delta < tol:
                            break
                    prev_ck = ranks
        if _iters_out is not None:
            _iters_out.append(iters_done)
        if iters_done:
            # restore the full vertex domain ONCE (see the loop comment):
            # vertices absent from the in-vertex rank state are out-only
            # and hold the constant reset·tele
            ranks = verts.join(ranks, "id", "left").select(
                "id",
                F.coalesce(F.col("rank"), F.lit(reset) * tele).alias("rank"))
        # force the remaining (post-checkpoint) iterations to execute while
        # the persisted state (verts/norm_edges) is still alive; the
        # checkpointed result no longer references it after unpersist
        ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        verts.unpersist()
        norm_edges.unpersist()


def katz_centrality(edges: DataFrame, iterations: int = 8,
                    alpha: float = 0.05, beta: float = 1.0,
                    checkpoint_every: int = 3,
                    broadcast_ranks: bool | None = None,
                    state_partitions: int | None = None,
                    broadcast_max_vertices: int = 2_000_000) -> DataFrame:
    """Katz centrality over the directed edge list: x_{t+1}(v) = beta +
    alpha · Σ_{(u,v)∈E} x_t(u), x_0 = beta — i.e. each vertex counts walks
    of every length arriving at it, damped by alpha^length (Katz 1953).
    Unlike PageRank there is NO out-degree normalization: a prolific
    source passes its full score along every edge, so alpha must stay
    below 1/λ_max for the series to converge (the default 0.05 is safe
    for the test graphs; fixed `iterations` bounds the computation either
    way).  Returns (id, katz), unnormalized.

    Plan shape is pagerank's (one shuffle per iteration on dst, rank
    vector broadcast under the same vertex-count guard, localCheckpoint
    cadence to bound lineage) minus the degree-normalization join — see
    pagerank's docstring for the 100×-scale posture.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if state_partitions:
        verts = verts.repartition(state_partitions, "id")
    verts = verts.persist()
    e_sel = edges.select("src", "dst")
    if state_partitions:
        e_sel = e_sel.repartition(state_partitions, "src")
    e_sel = e_sel.persist()
    if broadcast_ranks is None:
        broadcast_ranks = verts.count() <= broadcast_max_vertices
    try:
        ranks = verts.withColumn("katz", F.lit(float(beta)))
        for i in range(iterations):
            rank_side = ranks.withColumnRenamed("id", "src")
            if broadcast_ranks:
                rank_side = F.broadcast(rank_side)
            elif state_partitions:
                rank_side = rank_side.repartition(state_partitions, "src")
            # r11 (guide §2.4, pagerank's fill-join removal): from
            # iteration 2 on the state only covers in-vertices; an
            # out-only vertex's score is the constant beta (beta +
            # alpha·0.0 ≡ beta in IEEE), supplied by the left-join fill,
            # and the per-iteration verts completion join is gone —
            # restored once after the loop.
            contribs = (
                e_sel.join(rank_side, "src", "left")
                .select(F.col("dst").alias("id"),
                        F.coalesce(F.col("katz"), F.lit(float(beta)))
                        .alias("c"))
            )
            if state_partitions:
                contribs = contribs.repartition(state_partitions, "id")
            ranks = (
                contribs.groupBy("id").agg(F.sum("c").alias("c"))
                .select(
                    "id",
                    (F.lit(float(beta)) + F.lit(float(alpha))
                     * F.coalesce("c", F.lit(0.0))).alias("katz"),
                )
            )
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                # r12: lazy — nothing reads the state between iterations
                # (see pagerank); all in-loop checkpoints ride the final
                # eager action
                ranks = ranks.localCheckpoint(eager=False)
        if iterations:
            ranks = verts.join(ranks, "id", "left").select(
                "id",
                F.coalesce(F.col("katz"), F.lit(float(beta))).alias("katz"))
        return ranks.localCheckpoint(eager=True)
    finally:
        verts.unpersist()
        e_sel.unpersist()


def hits(edges: DataFrame, iterations: int = 8,
         state_partitions: int | None = None,
         tol: float | None = None,
         _iters_out: list | None = None) -> DataFrame:
    """HITS hubs & authorities (Kleinberg): per iteration the authority
    score is the sum of in-neighbor hub scores, then the hub score is the
    sum of out-neighbor NEW authority scores; each vector is normalized by
    its MAX — max is an exact order-independent selection (unlike an L2
    norm's float sum-of-squares), so normalization adds no cross-engine
    wobble beyond the group sums pagerank already lives with (absorbed by
    the caller's final rounding).  Returns (id, authority, hub) scaled to
    [0, 1].

    Plan shape per iteration: two aggregate-messages shuffles + two scalar
    max aggregates broadcast back; iteration-invariant edge list persisted
    once; localCheckpoint every 2 rounds cuts lineage — the same posture
    as pagerank, and the same bucketed-by-key co-location note applies at
    cluster scale.  `tol` (opt-in, like pagerank's) early-exits when the
    max |Δauth| AND max |Δhub| since the previous checkpoint both fall
    under tol; default None keeps the fixed-iteration oracle plan."""
    e = edges.select("src", "dst").distinct()
    if state_partitions:
        e = e.repartition(state_partitions, "src")
    e = e.persist()
    verts = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id"))).distinct()
             .persist())
    try:
        h = verts.withColumn("hub", F.lit(1.0))
        a = verts.withColumn("auth", F.lit(0.0))
        prev_a, prev_h = None, None
        iters_done = 0
        for i in range(iterations):
            iters_done = i + 1
            a = (e.join(h.withColumnRenamed("id", "src"), "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("hub").alias("auth")))
            a = verts.join(a, "id", "left").select(
                "id", F.coalesce("auth", F.lit(0.0)).alias("auth"))
            amax = a.agg(F.max("auth").alias("amax"))
            a = a.join(F.broadcast(amax)).select(
                "id", F.when(F.col("amax") > 0,
                             F.col("auth") / F.col("amax"))
                .otherwise(F.lit(0.0)).alias("auth"))
            h = (e.join(a.withColumnRenamed("id", "dst"), "dst")
                 .groupBy(F.col("src").alias("id"))
                 .agg(F.sum("auth").alias("hub")))
            h = verts.join(h, "id", "left").select(
                "id", F.coalesce("hub", F.lit(0.0)).alias("hub"))
            hmax = h.agg(F.max("hub").alias("hmax"))
            h = h.join(F.broadcast(hmax)).select(
                "id", F.when(F.col("hmax") > 0,
                             F.col("hub") / F.col("hmax"))
                .otherwise(F.lit(0.0)).alias("hub"))
            if (i + 1) % 2 == 0:
                a = a.localCheckpoint(eager=True)
                h = h.localCheckpoint(eager=True)
                if tol is not None:
                    if prev_a is not None:
                        da = (a.alias("n").join(prev_a.alias("o"), "id")
                              .agg(F.max(F.abs(
                                  F.col("n.auth") - F.col("o.auth")))
                                  .alias("d")).collect()[0]["d"])
                        dh = (h.alias("n").join(prev_h.alias("o"), "id")
                              .agg(F.max(F.abs(
                                  F.col("n.hub") - F.col("o.hub")))
                                  .alias("d")).collect()[0]["d"])
                        if (da is not None and dh is not None
                                and da < tol and dh < tol):
                            break
                    prev_a, prev_h = a, h
        if _iters_out is not None:
            _iters_out.append(iters_done)
        return a.join(h, "id").select("id", "auth", "hub")
    finally:
        e.unpersist()
        verts.unpersist()


def connected_components(edges: DataFrame, max_iterations: int = 20,
                         broadcast_max_vertices: int = 4_000_000) -> DataFrame:
    """Undirected connected components by iterative min-id label propagation
    (HashMin).  Returns (id, component) where component = min vertex id in
    the component.  Converges in O(diameter) rounds; each round is one
    aggregate-messages shuffle.  (Large-star/small-star halves the round
    count for huge graphs — HashMin keeps the plan simple and is fine while
    diameters are small, which holds for our fixture graphs.)"""
    # The symmetric adjacency is iteration-INVARIANT: materialize it once
    # (r11, guide §2.4) — previously this union+distinct subtree, AND the
    # caller's entire upstream lineage (e.g. er_clusters passes the raw
    # linkage pipeline in), re-executed inside every round's message join
    # and the label init.  One edge-scale job up front, every round after
    # reads the checkpointed RDD.
    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("a").alias("id")).distinct().withColumn("component", F.col("id"))
    )
    # r11 (guide §3.1, the pagerank/coloring posture): the label table is
    # VERTEX-scale but joins the EDGE-scale adjacency every round, and the
    # checkpointed adj/label frames carry default (huge) size stats
    # (_ckpt_fresh contract), so the planner never auto-broadcasts and AQE
    # can only demote AFTER the edge set has already shuffled.  One
    # vertex-count job up front (amortized over up to max_iterations
    # rounds) decides explicitly; past the guard the shuffle plan stays.
    bcast = labels.count() <= broadcast_max_vertices
    for i in range(max_iterations):
        lab_b = labels.withColumnRenamed("id", "b_id")
        if bcast:
            lab_b = F.broadcast(lab_b)
        msgs = (
            adj.join(lab_b, adj.b == F.col("b_id"))
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        if bcast:
            msgs = F.broadcast(msgs)
        new_labels = (
            labels.join(msgs, "id", "left")
            .select("id",
                    F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias("component"),
                    # change flag for the fixpoint probe: HashMin labels
                    # only ever decrease, so a row changed iff a strictly
                    # smaller neighbor minimum arrived
                    (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias("_chg"))
        )
        if (i + 1) % 3 == 0:
            # probe rides the checkpoint's materializing job (rule 31 /
            # _ckpt_fresh_probe): one action per probe round instead of
            # eager-checkpoint + separate join-count job
            probed, changed = _ckpt_fresh_probe(new_labels, F.col("_chg"))
            labels = probed.drop("_chg")
            if changed == 0:
                break
        else:
            labels = new_labels.drop("_chg")
    return labels


def connected_components_star(edges: DataFrame, max_iterations: int = 25,
                              _rounds_out: list | None = None,
                              broadcast_max_vertices: int = 4_000_000) -> DataFrame:
    """Undirected connected components by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — the opt-in scale path next to HashMin
    (connected_components): HashMin needs O(diameter) rounds, which stalls
    on 100×-scale high-diameter graphs (chains, road networks); star
    contraction converges in O(log² n) rounds regardless of diameter,
    each round two groupBy-join shuffles over the shrinking edge list.

    * large-star: per vertex u with m = min(Γ(u) ∪ {u}), rewire every
      LARGER neighbor v > u to m.
    * small-star: orient edges toward the smaller endpoint; per vertex u
      rewire u and all its smaller neighbors to their minimum.

    Both steps preserve connectivity (paper lemma); the fixed point is a
    forest of stars rooted at each component's MINIMUM id, so the labels
    are identical to HashMin's (component = min vertex id) — equality-
    tested.  Convergence is detected by edge-set fixpoint via ONE aggregate
    per round — (count, two independently-seeded xxhash64 sums in
    decimal(38,0), overflow-free) — instead of the former exceptAll
    anti-join, which cost a full extra pass over the edge set each round.
    Two 64-bit order-insensitive checksums agreeing on equal-size DISTINCT
    edge sets has collision odds ~2^-128 per round; a false "converged"
    additionally requires the colliding set to be a non-fixpoint, so the
    never-wrong contract holds to cosmic-ray precision.  Unconverged after
    max_iterations raises (never wrong labels).  `_rounds_out`, when
    a list, receives the number of rounds used (test/telemetry hook).

    Returns (id, component) for every vertex of the input (isolated
    self-loop-only vertices are their own components)."""
    v0 = (edges.select(F.col("src").alias("id"))
          .unionByName(edges.select(F.col("dst").alias("id"))).distinct()
          .localCheckpoint(eager=True))
    # r11 (guide §1.2 action budget): the canonical edge set's checkpoint
    # is LAZY — the initial signature aggregate below materializes it, so
    # setup costs one job instead of two; same fusion per round (the
    # signature IS the round's materializing action, the rule-31 pattern).
    e = (edges.filter(F.col("src") != F.col("dst"))
         .select(F.least("src", "dst").alias("u"),
                 F.greatest("src", "dst").alias("v"))
         .distinct().localCheckpoint(eager=False))

    def _sig(df: DataFrame) -> tuple:
        """(count, hash-sum, seeded-hash-sum) of a DISTINCT canonical edge
        set — order-insensitive, one aggregate pass; decimal(38,0) sums
        cannot overflow (2^63 * n fits comfortably in 38 digits)."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64(F.lit(0x5EED), "u", "v")
                  .cast("decimal(38,0)")).alias("h2"),
        ).collect()[0]
        return (row["n"], row["h1"], row["h2"])

    sig_prev = _sig(e)           # materializes the lazy checkpoint
    e = _fresh_from_ckpt(e, edges.sparkSession)
    # r11 (guide §3.1, the pagerank/coloring broadcast-under-guard
    # posture): `mins` and `mins2` are VERTEX-scale (one row per
    # still-active vertex), yet both per-round joins shuffled their
    # EDGE-scale side (nbrs by a, large by v).  Broadcast them while the
    # vertex count fits: the initial vertex set bounds every round's
    # active set (stars only shrink it), and v0 is already checkpointed,
    # so the bound is one cheap cached count at setup.  Past the guard
    # the rounds keep the shuffle-join plan.  Plan choice only; inner
    # equi-joins on exact keys, results identical (equality pytest vs
    # HashMin + the fallback pin).
    bcast = v0.count() <= broadcast_max_vertices
    rounds = 0
    converged = sig_prev[0] == 0
    for _ in range(max_iterations):
        if converged:
            break
        rounds += 1
        # ---- large-star ----
        nbrs = (e.select(F.col("u").alias("a"), F.col("v").alias("b"))
                .unionByName(
                    e.select(F.col("v").alias("a"), F.col("u").alias("b"))))
        mins = (nbrs.groupBy("a")
                .agg(F.least(F.min("b"), F.first("a")).alias("m")))
        if bcast:
            mins = F.broadcast(mins)
        # NOTE: no distinct here — duplicate (u, v) rows cannot change the
        # min aggregate below and the small-star output dedups anyway, so
        # the extra exchange a distinct would cost per round buys nothing
        # (sf0.1 timing is checkpoint-dominated and unchanged; at scale
        # one fewer full shuffle per round is strictly better)
        # large stays LAZY: it is one join+agg off the checkpointed edge
        # set, so its two consumers (mins2, the small-star join) recompute
        # a bounded plan — measured faster than materializing it
        # (8.7 vs 9.6s warm at sf0.1), and lineage cannot grow because the
        # per-round base is always the checkpointed `e`
        large = (nbrs.join(mins, "a")
                 .filter(F.col("b") > F.col("a"))
                 .select(F.least("b", "m").alias("u"),
                         F.greatest("b", "m").alias("v"))
                 .filter(F.col("u") != F.col("v")))
        # ---- small-star (edges already canonical u < v: group at v) ----
        mins2 = (large.groupBy(F.col("v").alias("a"))
                 .agg(F.min("u").alias("m")))
        if bcast:
            mins2 = F.broadcast(mins2)
        joined = large.join(mins2, large.v == mins2.a)
        small = (joined.select(F.col("a").alias("x"), F.col("m"))
                 .unionByName(joined.select(F.col("u").alias("x"), F.col("m")))
                 .filter(F.col("x") != F.col("m"))
                 .select(F.col("m").alias("u"), F.col("x").alias("v"))
                 .distinct()
                 .localCheckpoint(eager=False))
        # fixpoint: same canonical edge set, checked by one aggregate
        # (count + two independent order-insensitive hash sums) — no
        # per-round exceptAll join over the edge set.  The aggregate runs
        # on the LAZY checkpoint and doubles as its materializing job
        # (one action per round, was eager-checkpoint + aggregate).
        sig_now = _sig(small)
        small = _fresh_from_ckpt(small, edges.sparkSession)
        converged = sig_now == sig_prev
        e, sig_prev = small, sig_now
    if _rounds_out is not None:
        _rounds_out.append(rounds)
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_iterations} rounds — raise max_iterations")
    # stars: every non-root is (root=u, child=v); roots + isolated map to
    # themselves
    labels = e.select(F.col("v").alias("id"), F.col("u").alias("component"))
    return (v0.join(labels, "id", "left")
            .select("id", F.coalesce("component", F.col("id"))
                    .alias("component")))


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) training pairs from random_walks output — the
    step between walks and word2vec-style embedding training: within each
    walk, every ordered pair of vertices at distance 1..window co-occurs.
    Returns (center, context, step_offset) with multiplicity (a pair
    co-occurring at several positions yields several rows, exactly the
    corpus a skip-gram sampler wants).

    One self-join per walk id with a bounded step-distance predicate —
    walks are short (length L), so each walk contributes ≤ 2·L·window
    rows; the join key is wid, pre-partitioned by the walk generator."""
    if window < 1:
        raise ValueError("window must be >= 1")
    l = walks.select(F.col("wid"), F.col("step").alias("s_c"),
                     F.col("vertex").alias("center"))
    r = walks.select(F.col("wid"), F.col("step").alias("s_x"),
                     F.col("vertex").alias("context"))
    return (l.join(r, "wid")
            .filter((F.col("s_x") != F.col("s_c"))
                    & (F.abs(F.col("s_x") - F.col("s_c")) <= window))
            .select("center", "context",
                    (F.col("s_x") - F.col("s_c")).alias("step_offset")))


def link_prediction(edges: DataFrame, max_neighbor_degree: int | None = None,
                    exclude_existing: bool = True,
                    ra_scale: int = 1_000_000) -> DataFrame:
    """Neighborhood-overlap link-prediction scores for every candidate
    pair sharing ≥1 neighbor in the undirected simple graph:
    (a, b [a < b], common_neighbors, jaccard, ra_score).

    * common_neighbors — |N(a) ∩ N(b)| (exact count)
    * jaccard — cn / (deg(a) + deg(b) - cn): ONE integer division, so the
      double is engine-identical
    * ra_score — resource-allocation index Σ_{w∈N(a)∩N(b)} 1/deg(w),
      QUANTIZED: each term is round(ra_scale/deg(w)) summed as integers
      (order-independent) and divided once at the end — the same
      exactification trick as harmonic closeness.  (Adamic-Adar's 1/log
      deg is libm-unportable; RA is its rational sibling.)

    Scale: a shared neighbor of degree d contributes d·(d-1)/2 candidate
    pairs, so one hub makes the pair generation quadratic.
    `max_neighbor_degree` drops wedges through hubs above the cap BEFORE
    any pair is generated (mirrored in any oracle): hubs contribute
    near-zero RA weight (1/deg) and inflate Jaccard denominators anyway,
    so the cap trades negligible signal for the quadratic term — the same
    bounded-bucket posture as LSH's max_bucket_size.

    Plan (r9): with a cap, pairs come from ONE groupBy — each surviving
    shared neighbor collects its sorted neighbor array (≤ cap elements by
    the pre-filter semi-join, so the aggregation buffer is bounded) and
    streams its C(d,2) combinations out through a two-stage explode
    (posexplode × slice, never materializing the pair array) — replacing
    the edge×edge wedge self-join, i.e. one fewer full shuffle of an
    edge-sized relation (measured ~35% at sf0.1; the saving grows with
    the shuffle).  Uncapped falls back to the wedge self-join: an
    unbounded collect_list on a hub is a single-task memory bomb, while
    the join at least distributes the quadratic output."""
    canon = (_undirected_simple(edges)                # (u < v), each once
             .localCheckpoint(eager=True))            # reused 3×
    adj = (canon.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionByName(canon.select(F.col("v").alias("a"),
                                     F.col("u").alias("b"))))
    # r11 (guide §2.4): deg is vertex-sized but consumed by THREE separate
    # join subtrees (the hub-cap semi-join plus the final deg_u/deg_v
    # joins) — without the lazy checkpoint each re-ran the edge-scale
    # degree aggregation; the first consumer's job materializes it once.
    deg = (adj.groupBy(F.col("a").alias("id"))
           .agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=False))
    if max_neighbor_degree is not None:
        ok = (deg.filter(F.col("deg") <= max_neighbor_degree)
              .select(F.col("id").alias("b")))
        grp = (adj.join(ok, "b", "semi")
               .groupBy(F.col("b").alias("w"))
               .agg(F.array_sort(F.collect_list("a")).alias("ns")))
        raq = F.round(F.lit(float(ra_scale)) / F.size("ns")).cast("long")
        pairs_raw = (
            grp.select("ns", raq.alias("raq"),
                       F.posexplode("ns").alias("i", "u"))
            .select("raq", "u",
                    F.explode(F.expr("slice(ns, i + 2, size(ns))"))
                    .alias("v")))
        pairs = (pairs_raw.groupBy("u", "v")
                 .agg(F.count(F.lit(1)).alias("common_neighbors"),
                      F.sum("raq").alias("ra_q")))
    else:
        wd = adj.join(deg.withColumnRenamed("id", "b"), "b")
        left = wd.select(F.col("a").alias("u"), F.col("b").alias("w"),
                         F.col("deg").alias("wdeg"))
        right = wd.select(F.col("a").alias("v"), F.col("b").alias("w"))
        pairs = (left.join(right, "w")
                 .filter(F.col("u") < F.col("v"))
                 .groupBy("u", "v")
                 .agg(F.count(F.lit(1)).alias("common_neighbors"),
                      F.sum(F.round(F.lit(float(ra_scale)) / F.col("wdeg"))
                            .cast("long")).alias("ra_q")))
    if exclude_existing:
        pairs = pairs.join(canon, ["u", "v"], "left_anti")
    pairs = (pairs
             .join(deg.select(F.col("id").alias("u"),
                              F.col("deg").alias("deg_u")), "u")
             .join(deg.select(F.col("id").alias("v"),
                              F.col("deg").alias("deg_v")), "v"))
    return pairs.select(
        F.col("u").alias("a"), F.col("v").alias("b"), "common_neighbors",
        (F.col("common_neighbors")
         / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors"))
         ).alias("jaccard"),
        (F.col("ra_q") / F.lit(float(ra_scale))).alias("ra_score"))


def strongly_connected_components(edges: DataFrame, max_rounds: int = 4,
                                  prop_iterations: int = 12,
                                  trim_iterations: int = 10) -> DataFrame:
    """Directed strongly connected components: (id, scc), scc = min vertex
    id of the component.  Completes the directed-graph algebra next to the
    undirected HashMin in connected_components (the reference exposes no
    graph algorithms at all; this is north-star surface).

    Algorithm — the standard distributed trim + FW-BW coloring:

    1. **Trim**: a vertex with in-degree 0 or out-degree 0 in the remaining
       graph cannot sit on a cycle — assign it its own singleton SCC and
       peel it.  Iterated, this alone consumes every DAG-shaped region (the
       bulk of real graphs), leaving only the cyclic core for phase 2.
    2. **Color**: forward min-label propagation to fixpoint — color(v) =
       min id over {v} ∪ ancestors(v).  The pivot of color c is vertex c
       itself (c reaches every v colored c).
    3. **Backward membership**: within color c, mark v when an edge v→u has
       u already marked (seeded at the pivot) — marked vertices reach the
       pivot forward, so pivot→v ∧ v→pivot ⇒ SCC(pivot).  Assign, peel,
       back to 1.

    Every step is a join+groupBy on (src|dst) — the aggregate-messages
    shuffle shape — with localCheckpoint lineage cuts per round, so the
    plan never grows with the iteration count.  Vertices still unresolved
    after max_rounds come back with scc NULL (bounded-rounds contract,
    like connected_components' bounded iterations — never a wrong merge).
    Self-loops are SCC-neutral and dropped up front; vertices appearing
    only in self-loops are singletons."""
    v0 = (edges.select(F.col("src").alias("id"))
          .unionByName(edges.select(F.col("dst").alias("id"))).distinct())
    e = (edges.filter(F.col("src") != F.col("dst"))
         .select("src", "dst").distinct().localCheckpoint(eager=True))

    assigned = []  # list of (id, scc) DataFrames

    # vertices with no non-self edge at all: singletons immediately
    ev = (e.select(F.col("src").alias("id"))
          .unionByName(e.select(F.col("dst").alias("id"))).distinct())
    lonely = v0.join(ev, "id", "left_anti")
    assigned.append(lonely.withColumn("scc", F.col("id")))

    def _trim(e):
        for _ in range(trim_iterations):
            has_in = e.select(F.col("dst").alias("id")).distinct()
            has_out = e.select(F.col("src").alias("id")).distinct()
            verts = has_in.unionByName(has_out).distinct()
            core = has_in.join(has_out, "id")  # in ≥ 1 AND out ≥ 1
            trivial = verts.join(core, "id", "left_anti") \
                .localCheckpoint(eager=True)
            if trivial.limit(1).count() == 0:
                return e
            assigned.append(trivial.withColumn("scc", F.col("id")))
            e = (e.join(trivial.select(F.col("id").alias("src")), "src", "left_anti")
                 .join(trivial.select(F.col("id").alias("dst")), "dst", "left_anti")
                 .localCheckpoint(eager=True))
        return e

    for _ in range(max_rounds):
        e = _trim(e)
        if e.limit(1).count() == 0:
            break
        verts = (e.select(F.col("src").alias("id"))
                 .unionByName(e.select(F.col("dst").alias("id"))).distinct())
        colors = verts.withColumn("color", F.col("id"))
        colors_converged = False
        for i in range(prop_iterations):
            msgs = (e.join(colors.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("color").alias("in_min")))
            nxt = (colors.join(msgs, "id", "left")
                   .select("id", F.least(F.col("color"),
                                         F.coalesce("in_min", F.col("color"))
                                         ).alias("color")))
            if (i + 1) % 3 == 0 or i == prop_iterations - 1:
                nxt = nxt.localCheckpoint(eager=True)
                changed = (nxt.alias("n").join(colors.alias("o"), "id")
                           .filter(F.col("n.color") != F.col("o.color"))
                           .limit(1).count())
                colors = nxt
                if changed == 0:
                    colors_converged = True
                    break
            else:
                colors = nxt
        if not colors_converged:
            # Coloring did not reach fixpoint within the bound: colors are
            # mixed inside at least one SCC, so any assignment this round
            # could split a component.  Honor the documented contract —
            # remaining vertices come back NULL — instead of a wrong merge.
            break
        colors = colors.localCheckpoint(eager=True)
        # backward membership from each pivot within its color class
        marked = colors.filter(F.col("id") == F.col("color"))
        ce = (e.join(colors.withColumnRenamed("id", "src")
                     .withColumnRenamed("color", "c_src"), "src")
              .join(colors.withColumnRenamed("id", "dst")
                    .withColumnRenamed("color", "c_dst"), "dst")
              .filter(F.col("c_src") == F.col("c_dst"))
              .select("src", "dst", F.col("c_src").alias("color"))
              .localCheckpoint(eager=True))
        marking_converged = False
        for i in range(prop_iterations):
            newly = (ce.join(marked.select(F.col("id").alias("dst"),
                                           F.col("color").alias("m_color")),
                             "dst")
                     .filter(F.col("color") == F.col("m_color"))
                     .select(F.col("src").alias("id"), "color").distinct()
                     .join(marked.select("id"), "id", "left_anti"))
            newly = newly.localCheckpoint(eager=True)
            if newly.limit(1).count() == 0:
                marking_converged = True
                break
            marked = marked.unionByName(newly).localCheckpoint(eager=True)
        if not marking_converged:
            # Backward marking stopped early: `marked` holds only a subset
            # of each pivot's SCC.  Assigning and peeling the subset would
            # leave the rest to be trimmed as fake singletons next round —
            # the wrong-split the contract forbids.  Bail; rest come back
            # NULL.
            break
        assigned.append(marked.select("id", F.col("color").alias("scc")))
        e = (e.join(marked.select(F.col("id").alias("src")), "src", "left_anti")
             .join(marked.select(F.col("id").alias("dst")), "dst", "left_anti")
             .localCheckpoint(eager=True))

    out = assigned[0]
    for a in assigned[1:]:
        out = out.unionByName(a)
    return v0.join(out, "id", "left").select("id", "scc")


def _degree_oriented(und: DataFrame) -> DataFrame:
    """Degree-ordered orientation of the canonical undirected edge set:
    each edge points from its LOWER-degree endpoint to the higher (ties by
    id).  Returns (x, y, dx, dy) with (dx, x) < (dy, y) lexicographically.

    Why: the oriented out-degree of every vertex is bounded by O(√m)
    (arboricity bound), so wedge enumeration at the orientation apex is
    hub-proof — a degree-d celebrity vertex contributes O(√m·d) wedge rows
    instead of the O(d²) an id-ordered enumeration pays, with EXACTLY the
    same triangles found.  One degree aggregation + two key joins, all
    shuffle-partitioned on the vertex id."""
    deg = (und.select(F.col("u").alias("id"))
           .unionByName(und.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("_deg")))
    e = (und
         .join(deg.select(F.col("id").alias("u"), F.col("_deg").alias("du")),
               "u")
         .join(deg.select(F.col("id").alias("v"), F.col("_deg").alias("dv")),
               "v"))
    fwd = (F.col("du") < F.col("dv")) | \
          ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    return e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("dx"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )


def _oriented_triangles(und: DataFrame, _o: DataFrame | None = None) -> DataFrame:
    """Every triangle of the undirected simple graph, exactly once, as
    (a, b, c) ranked by the (degree, id) total order (a = apex = minimum).

    Wedges are enumerated at the orientation apex — both wedge arms are
    OUT-edges of x, so the fan-out is the O(√m)-bounded oriented
    out-degree — then closed against the oriented edge set: the third edge
    b—c is oriented b→c precisely because order(b) < order(c), so one
    equi-join finds it and no triangle is double-counted.

    The oriented edge set is localCheckpoint'ed: it is referenced three
    times (two wedge arms + the closure), and its lineage may carry an
    arbitrarily expensive edge-view derivation — materialize once, join
    three times (the same reuse rule the pagerank state follows).
    `_o` lets callers that ALSO need the oriented edge set (4-clique
    enumeration) pass the checkpointed copy in instead of re-deriving."""
    o = _o if _o is not None else \
        _degree_oriented(und).localCheckpoint(eager=True)
    e1 = o.select("x", F.col("y").alias("b"), F.col("dy").alias("db"))
    e2 = o.select("x", F.col("y").alias("c"), F.col("dy").alias("dc"))
    wedges = (e1.join(e2, "x")
              .filter((F.col("db") < F.col("dc")) |
                      ((F.col("db") == F.col("dc")) &
                       (F.col("b") < F.col("c")))))
    return (wedges
            .join(o.select(F.col("x").alias("b"), F.col("y").alias("c")),
                  ["b", "c"])
            .select(F.col("x").alias("a"), "b", "c"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over the undirected simple graph via the
    degree-oriented wedge join (_oriented_triangles): two shuffles, each
    triangle counted exactly once, per-vertex wedge fan-out bounded O(√m)
    so one hub vertex can no longer make the join quadratic.
    Returns a 1-row DataFrame (n_triangles)."""
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    return _oriented_triangles(und).agg(F.count(F.lit(1)).alias("n_triangles"))


def four_clique_count(edges: DataFrame) -> DataFrame:
    """Global 4-clique (K4) count over the undirected simple graph —
    triangle_count one level up, on the same degree-oriented machinery.

    A K4 ordered a<b<c<d by the (degree, id) total order decomposes into
    the oriented triangle (a, b, c) plus the vertex d reached by the three
    oriented edges a→d, b→d, c→d.  Enumeration: fan each oriented triangle
    out along c's OUT-edges (c→d implies order(c) < order(d), so each K4
    is produced exactly once and the fan-out is the O(√m)-bounded oriented
    out-degree — hub-proof, like the wedge step), then close with two
    semi-joins on (a, d) and (b, d).  Cost: O(triangles·√m) candidate rows
    shuffled on equi-keys, never a cross join; a star hub contributes zero
    oriented triangles and therefore zero candidate rows.

    Returns a 1-row DataFrame (n_4cliques)."""
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    o = _degree_oriented(und).localCheckpoint(eager=True)
    tri = _oriented_triangles(und, _o=o)
    cand = tri.join(o.select(F.col("x").alias("c"), F.col("y").alias("d")),
                    "c")
    k4 = (cand
          .join(o.select(F.col("x").alias("a"), F.col("y").alias("d")),
                ["a", "d"], "left_semi")
          .join(o.select(F.col("x").alias("b"), F.col("y").alias("d")),
                ["b", "d"], "left_semi"))
    return k4.agg(F.count(F.lit(1)).alias("n_4cliques"))


def _undirected_simple(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edges (u < v), self-loops dropped."""
    return (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def k_core(edges: DataFrame, k: int, max_iterations: int = 30) -> DataFrame:
    """k-core membership over the undirected simple graph: iteratively
    delete vertices with degree < k until fixpoint; returns the survivors
    as (id, degree) with degree measured INSIDE the core subgraph.

    The classic distributed peeling loop: each round is one degree
    aggregation (map-side combinable) plus two semi-joins that restrict the
    adjacency to surviving endpoints — O(rounds × |E|) shuffled, rounds
    bounded by the peeling depth (typically ≪ diameter).  State between
    rounds is only the shrinking adjacency list, localCheckpoint'ed so the
    lineage stays flat.  The fixpoint is unique, so early exit on a
    no-vertex-removed round is safe regardless of max_iterations."""
    und = _undirected_simple(edges)
    adj = (und.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
           .localCheckpoint(eager=True))
    n_prev = adj.select("a").distinct().count()
    for _ in range(max_iterations):
        keep = (adj.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
                .filter(F.col("_d") >= k).select("a"))
        nxt = (adj.join(keep, "a")
               .join(keep.withColumnRenamed("a", "b"), "b")
               .select("a", "b")
               .localCheckpoint(eager=True))
        n_now = nxt.select("a").distinct().count()
        adj = nxt
        if n_now == n_prev:
            break
        n_prev = n_now
    return (adj.groupBy(F.col("a").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree")))


def _hindex_round(adj: DataFrame, c: DataFrame) -> DataFrame:
    """One h-index iteration round, SORT-FREE over the neighbor stream:

    1. the (a, cb) neighbor-value messages are first reduced by a
       map-side-combinable ``groupBy(id, cb).count()`` into each vertex's
       VALUE-DISTRIBUTION CURVE — a degree-10⁸ hub's messages hash-combine
       in parallel instead of piling into one window-sort task;
    2. the per-vertex window (suffix counts, desc by value) then runs over
       the CURVE only: ≤ B+1 rows per vertex, where B bounds every c value
       (see core_numbers — B ≈ O(√m)), a hard cap independent of degree;
    3. H-index = max over curve points of min(value, suffix_count) — for
       distinct values v₁>v₂>… with suffix counts S₁<S₂<…, the optimum
       h = max{h : #{cb ≥ h} ≥ h} is attained at a curve point.
    """
    from pyspark.sql.window import Window

    nbr = (adj.join(c.select(F.col("id").alias("b"),
                             F.col("c").alias("cb")), "b")
           .select(F.col("a").alias("id"), "cb"))
    curve = nbr.groupBy("id", "cb").agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.partitionBy("id").orderBy(F.col("cb").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (curve.withColumn("_s", F.sum("cnt").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("cb"), F.col("_s"))).alias("c")))


def _hindex_of_degree_distribution(deg: DataFrame, val_col: str = "c") -> int:
    """H-index of a degree multiset given per-vertex: max h with ≥ h
    vertices of degree ≥ h.  Aggregates to the (value, count) distribution
    first — a multiset of D distinct nonnegative values sums to at least
    D(D−1)/2, so the distribution has ≤ O(√(Σdeg)) = O(√m) rows and the
    single global suffix-count window runs over that tiny frame, never the
    vertex set.  Returns a driver int (1-row scalar probe by contract)."""
    from pyspark.sql.window import Window

    dist = deg.groupBy(F.col(val_col).alias("v")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.orderBy(F.col("v").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    row = (dist.withColumn("_s", F.sum("cnt").over(w))
           .agg(F.max(F.least(F.col("v"), F.col("_s"))).alias("b"))
           .collect())
    return int(row[0]["b"] or 0)


def core_numbers(edges: DataFrame, max_iterations: int = 30) -> DataFrame:
    """FULL k-core decomposition: (id, core) where core(v) is the largest
    k such that v belongs to the k-core — the whole ladder k_core(k)
    answers one rung of, in one computation.

    Distributed h-index iteration (Lü et al., "The H-index of a network
    node"): each round sets c(v) to the H-index of its neighbors' current
    values (the largest h with ≥ h neighbors at c ≥ h); values are
    non-increasing and converge exactly to the core numbers.

    Skew posture (VERDICT r6): initialization is c(v) = min(degree(v), B)
    with B the h-index of the DEGREE SEQUENCE — B ≥ degeneracy = max core
    (a k-core holds ≥ k+1 vertices of degree ≥ k), and B ≤ O(√m), so
    every c value is globally capped at O(√m) from round 0.  The capped
    start still converges to the exact core numbers: the h-index operator
    T is pointwise monotone and core = T(core), so core = Tᵏ(core) ≤
    Tᵏ(c₀) ≤ Tᵏ(degree) → core.  Each round then reduces the neighbor
    stream by a combinable (id, value) count before any window — see
    _hindex_round; no per-vertex sort ever sees a full neighbor list, so
    a degree-10⁸ celebrity costs a hash-combine, not a straggler task.
    Early exit on an unchanged round is safe (monotone convergence).
    Raises if still changing after max_iterations (never wrong values)."""
    und = _undirected_simple(edges)
    adj = (und.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionByName(und.select(F.col("v").alias("a"),
                                   F.col("u").alias("b")))
           .localCheckpoint(eager=True))
    deg = (adj.groupBy(F.col("a").alias("id"))
           .agg(F.count(F.lit(1)).alias("c")))
    bound = _hindex_of_degree_distribution(deg)
    c = (deg.select("id", F.least(F.col("c"), F.lit(bound)).alias("c"))
         .localCheckpoint(eager=True))

    converged = False
    for _ in range(max_iterations):
        nxt = _hindex_round(adj, c).localCheckpoint(eager=True)
        changed = (nxt.alias("n").join(c.alias("o"), "id")
                   .filter(F.col("n.c") != F.col("o.c"))
                   .limit(1).count())
        c = nxt
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"core_numbers did not converge in {max_iterations} rounds")
    # vertices only in self-loops / isolated: core 0
    v0 = (edges.select(F.col("src").alias("id"))
          .unionByName(edges.select(F.col("dst").alias("id"))).distinct())
    return (v0.join(c.select("id", F.col("c").alias("core")), "id", "left")
            .select("id", F.coalesce("core", F.lit(0)).alias("core")))


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row whole-graph statistics: (n_vertices, n_edges, max_degree,
    avg_degree) — the numbers every capacity-planning and
    partitioning-strategy decision starts from.  One endpoint-explode +
    one aggregation (map-side combinable); n_edges falls out of
    sum(degree)/2, so there is no separate edge count pass and no scalar
    cross join.  All inputs exact integers; avg_degree is the single
    final division."""
    ends = (edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id"))))
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum("degree") / F.lit(2)).cast("long").alias("n_edges"),
        F.max("degree").alias("max_degree"),
        (F.sum("degree") / F.count(F.lit(1))).alias("avg_degree"),
    )


def graph_structure_stats(edges: DataFrame) -> DataFrame:
    """One-row global structure metrics over the undirected simple graph:
    (n_triangles, n_wedges, transitivity, assortativity).

    * transitivity (global clustering) = 3·triangles / wedges, wedges =
      Σ d(d−1)/2 — the closed-wedge fraction;
    * degree assortativity = Pearson r of endpoint degrees over the
      directed double cover.  Both marginals are identical there, so
      r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — no square roots, and every
      Σ is an EXACT integer sum of small ints (order-independent); the
      single final division runs in doubles on exact inputs, so the
      rounded result is engine-identical.

    Cost: the degree aggregate, the oriented triangle count (hub-proof),
    and one edge⋈degree join — all map-side-combinable aggregates; the
    three 1-row results meet in broadcast cross joins."""
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    deg = (und.select(F.col("u").alias("id"))
           .unionByName(und.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    tri = _oriented_triangles(und).agg(
        F.count(F.lit(1)).alias("n_triangles"))
    wed = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("two_wedges"))
    dp = (und.join(deg.select(F.col("id").alias("u"),
                              F.col("d").alias("du")), "u")
          .join(deg.select(F.col("id").alias("v"),
                           F.col("d").alias("dv")), "v"))
    both = (dp.select(F.col("du").alias("x"), F.col("dv").alias("y"))
            .unionByName(dp.select(F.col("dv").alias("x"),
                                   F.col("du").alias("y"))))
    st = both.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("x").alias("sx"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"))
    num = (F.col("n") * F.col("sxy")).cast("double") \
        - (F.col("sx") * F.col("sx")).cast("double")
    den = (F.col("n") * F.col("sxx")).cast("double") \
        - (F.col("sx") * F.col("sx")).cast("double")
    return (tri.join(F.broadcast(wed)).join(F.broadcast(st))
            .select(
                "n_triangles",
                (F.col("two_wedges") / 2).cast("long").alias("n_wedges"),
                F.round(F.when(F.col("two_wedges") > 0,
                               6.0 * F.col("n_triangles")
                               / F.col("two_wedges"))
                        .otherwise(F.lit(0.0)), 6).alias("transitivity"),
                F.round(F.when(den != 0, num / den).otherwise(F.lit(0.0)),
                        6).alias("assortativity")))


def landmark_eccentricity(edges: DataFrame, landmarks: list[int],
                          iterations: int = 10) -> DataFrame:
    """Per-landmark eccentricity estimate: the max hop distance (and the
    count of vertices reaching the landmark) over the landmark-BFS state —
    a free by-product of shortest_paths, and the standard lower-bound
    estimator for graph diameter (diameter >= max eccentricity seen).
    Returns (landmark, n_reaching, eccentricity)."""
    d = shortest_paths(edges, landmarks, iterations)
    return (d.groupBy("landmark")
            .agg(F.count(F.lit(1)).alias("n_reaching"),
                 F.max("distance").alias("eccentricity")))


def _edge_support(und: DataFrame) -> DataFrame:
    """Triangle count per canonical edge (u < v): degree-oriented triangle
    enumeration (_oriented_triangles — hub-proof), each triangle attributed
    to its three edges re-canonicalized to id order (the a/b/c ranking is
    by (degree, id), not id)."""
    tri = _oriented_triangles(und)
    return (
        tri.select(F.explode(F.array(
            F.struct(F.least("a", "b").alias("u"),
                     F.greatest("a", "b").alias("v")),
            F.struct(F.least("b", "c").alias("u"),
                     F.greatest("b", "c").alias("v")),
            F.struct(F.least("a", "c").alias("u"),
                     F.greatest("a", "c").alias("v")))).alias("e"))
        .select("e.u", "e.v")
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    )


def k_truss(edges: DataFrame, k: int, max_iterations: int = 20) -> DataFrame:
    """k-truss of the undirected simple graph: the maximal subgraph in
    which every EDGE participates in at least k−2 triangles — the
    edge-level cohesion ladder above vertex k-core (every k-truss edge set
    is inside the (k−1)-core, but prunes far more aggressively).

    Distributed peeling like k_core, one level up — with DELTA support
    maintenance: the full O(wedges) triangle count (_edge_support, the
    degree-oriented hub-proof enumeration) runs ONCE; each peel round then
    enumerates only the triangles incident to that round's REMOVED edges
    (fan-out from the lower-degree endpoint of each removal — the same
    min-degree pivot that makes the full enumeration hub-proof — closed by
    a semi-join against the surviving edge set) and decrements the
    survivors' support by the destroyed-triangle count.  Support can only
    fall as edges leave, so the fixpoint is unique and the early exit safe;
    rounds are bounded by peeling depth and each costs O(Σ min-degree over
    removals), the changed neighborhood, not O(wedges) again.
    Returns the surviving canonical edges as (u, v, support) with support
    measured INSIDE the truss."""
    cur = _undirected_simple(edges).localCheckpoint(eager=True)
    thresh = k - 2
    # full edge set with support (0 for triangle-free edges — they peel
    # first): the ONLY full wedge enumeration in the whole call
    sup = (cur.join(_edge_support(cur), ["u", "v"], "left")
           .select("u", "v",
                   F.coalesce("support", F.lit(0).cast("long"))
                   .alias("support"))
           .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        drop = (sup.filter(F.col("support") < thresh).select("u", "v")
                .localCheckpoint(eager=True))
        if drop.isEmpty():
            break
        survivors = sup.join(drop, ["u", "v"], "left_anti")
        # fan out each removed edge from its LOWER-degree endpoint
        # (degrees over the pre-removal graph) — hub-proof delta wedges
        deg = (sup.select(F.col("u").alias("id"))
               .unionByName(sup.select(F.col("v").alias("id")))
               .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
        du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
        piv = (drop.join(du, "u").join(dv, "v")
               .select(F.when(F.col("du") <= F.col("dv"), F.col("u"))
                       .otherwise(F.col("v")).alias("p"),
                       F.when(F.col("du") <= F.col("dv"), F.col("v"))
                       .otherwise(F.col("u")).alias("o")))
        adj = (sup.select(F.col("u").alias("p"), F.col("v").alias("w"))
               .unionByName(
                   sup.select(F.col("v").alias("p"), F.col("u").alias("w"))))
        # candidate third vertex w adjacent to the pivot; triangle exists
        # iff (w, other) is also an edge of the pre-removal graph
        cand = (piv.join(adj, "p").filter(F.col("w") != F.col("o"))
                .select("p", "o", "w",
                        F.least("w", "o").alias("cu"),
                        F.greatest("w", "o").alias("cv")))
        destroyed = (cand.join(
                        sup.select(F.col("u").alias("cu"),
                                   F.col("v").alias("cv")),
                        ["cu", "cv"], "left_semi")
                     # a triangle with 2-3 removed edges is found once per
                     # removal: dedupe by the sorted vertex triple
                     .select(F.array_sort(F.array("p", "o", "w")).alias("t"))
                     .distinct()
                     .select(F.col("t")[0].alias("a"), F.col("t")[1].alias("b"),
                             F.col("t")[2].alias("c")))
        dec = (destroyed
               .select(F.explode(F.array(
                   F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                   F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
                   F.struct(F.col("a").alias("u"), F.col("c").alias("v"))))
                   .alias("e"))
               .select("e.u", "e.v")
               .groupBy("u", "v").agg(F.count(F.lit(1)).alias("dec")))
        sup = (survivors.join(dec, ["u", "v"], "left")
               .select("u", "v",
                       (F.col("support") - F.coalesce("dec", F.lit(0)))
                       .alias("support"))
               .localCheckpoint(eager=True))
    out = sup
    if thresh < 1:
        # parity with the recount formulation for k <= 2: only edges that
        # sit in at least one triangle are part of any truss
        out = out.filter(F.col("support") >= 1)
    return out


def clustering_coefficient(edges: DataFrame,
                           canonical: bool = False) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected simple
    graph: coeff(v) = 2·T(v) / (d(v)·(d(v)−1)), where T(v) is the number of
    triangles through v (0 when d < 2).  Rides the same degree-oriented
    wedge join as triangle_count (hub-proof O(√m) fan-out), then attributes
    each triangle to its three corners (explode — three rows per triangle,
    no re-join) and divides by the degree pair count.  All inputs to the division are exact integers, so
    the double result is bit-identical across engines.

    `canonical=True` (r11, guide §2.4 "a distinct on data that is already
    unique"): the caller asserts `edges` is ALREADY the canonical
    undirected simple set — src < dst on every row, no duplicates — so
    the full edge-scale least/greatest + distinct exchange is skipped
    (the co-purchase builder's `x.l_partkey < y.l_partkey` filter +
    distinct guarantees exactly this).  Equality with the canonicalizing
    path is pytest-pinned.
    Returns (id, n_triangles, coeff) for every vertex of the graph."""
    # materialize the canonical edge set once: it feeds both the triangle
    # enumeration (degree + orientation + closure) and the final degree
    # join, and its lineage may carry an expensive derivation
    und = (edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
           if canonical else _undirected_simple(edges)) \
        .localCheckpoint(eager=True)
    per_vertex = (
        _oriented_triangles(und)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (und.select(F.col("u").alias("id"))
           .unionByName(und.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("_d")))
    return (
        deg.join(per_vertex, "id", "left")
        .select(
            "id",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(F.col("_d") < 2, F.lit(0.0))
            .otherwise(2.0 * F.coalesce("n_triangles", F.lit(0))
                       / (F.col("_d") * (F.col("_d") - 1.0)))
            .alias("coeff"),
        )
    )


def shortest_paths(edges: DataFrame, landmarks: list[int], iterations: int = 10) -> DataFrame:
    """GraphX-style ShortestPaths: hop distance from every vertex TO each
    landmark, following edge direction (dist(v,l) = 1 + min over
    out-neighbors w of dist(w,l); seed dist(l,l)=0).

    Fixed iteration count (deterministic, oracle-matchable); converges when
    iterations >= graph diameter.  One aggregate-messages shuffle per round
    over (id, landmark) pairs — state size |V|×|landmarks|, so keep the
    landmark set small (that's the GraphX contract too).
    Returns (id, landmark, distance) for reachable pairs."""
    spark = edges.sparkSession
    adj = edges.select("src", "dst").distinct().persist()
    try:
        dists = spark.createDataFrame(
            [(int(l), int(l), 0) for l in landmarks], "id long, landmark long, distance int"
        )
        for _ in range(iterations):
            msgs = (
                adj.join(dists.withColumnRenamed("id", "dst"), "dst")
                .select(F.col("src").alias("id"), "landmark",
                        (F.col("distance") + 1).alias("distance"))
            )
            dists = (
                dists.unionByName(msgs)
                .groupBy("id", "landmark")
                .agg(F.min("distance").alias("distance"))
                .localCheckpoint(eager=True)
            )
        return dists
    finally:
        adj.unpersist()


def label_propagation(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """Synchronous label propagation (community detection): each round every
    vertex adopts the most frequent label among its undirected neighbors,
    ties broken by smallest label — fully deterministic, so a fixed round
    count is oracle-matchable.  Returns (id, community)."""
    from pyspark.sql.window import Window

    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .persist()
    )
    try:
        labels = adj.select(F.col("a").alias("id")).distinct().withColumn("community", F.col("id"))
        w = Window.partitionBy("a").orderBy(F.col("n").desc(), F.col("community").asc())
        for _ in range(iterations):
            counts = (
                adj.join(labels.withColumnRenamed("id", "b"), "b")
                .groupBy("a", "community")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            best = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(F.col("a").alias("id"), "community")
            )
            # vertices with no neighbors keep their label (none here: adj covers all)
            labels = best.localCheckpoint(eager=True)
        return labels
    finally:
        adj.unpersist()


def modularity(edges: DataFrame, labels: DataFrame,
               label_col: str = "community") -> DataFrame:
    """Per-community Newman modularity contributions of a labeling, in
    EXACT integers: for community c with e_c intra-community edges and
    degree sum d_c over the undirected simple graph with m edges,

        contrib(c) = 4·m·e_c − d_c²       (so Q = Σ contrib / 4m²)

    All arithmetic runs in decimal(38,0) — overflow-free up to ~10^18
    edges, far past 100 TB graphs, and bit-identical across engines
    (no float sums).  Completes the community family next to
    label_propagation the way core_numbers completed k_core: LPA gives
    labelings, modularity scores them.

    Returns (community, intra_edges, degree_sum, contrib, q_share) — one
    row per community that contains at least one non-isolated vertex;
    q_share = contrib / 4m² as a rounded double for human consumption,
    contrib is the exact integer the oracle checks."""
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    m = und.count()  # 1 driver scalar, metadata-sized by contract
    lab = labels.select("id", F.col(label_col).alias("_c"))
    deg = (und.select(F.col("u").alias("id"))
           .unionByName(und.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("_d")))
    lu = lab.select(F.col("id").alias("u"), F.col("_c").alias("_cu"))
    lv = lab.select(F.col("id").alias("v"), F.col("_c").alias("_cv"))
    e_c = (und.join(lu, "u").join(lv, "v")
           .filter(F.col("_cu") == F.col("_cv"))
           .groupBy(F.col("_cu").alias("community"))
           .agg(F.count(F.lit(1)).alias("intra_edges")))
    d_c = (deg.join(lab, "id")
           .groupBy(F.col("_c").alias("community"))
           .agg(F.sum("_d").alias("degree_sum")))

    def _dec(c) -> Column:
        return (F.col(c) if isinstance(c, str) else c).cast("decimal(38,0)")

    four_m = F.lit(4 * m).cast("decimal(38,0)")
    denom = float(4 * m * m) if m else 1.0
    return (d_c.join(e_c, "community", "left")
            .select("community",
                    F.coalesce("intra_edges", F.lit(0).cast("long"))
                    .alias("intra_edges"),
                    "degree_sum")
            .withColumn("contrib",
                        (four_m * _dec("intra_edges")
                         - _dec("degree_sum") * _dec("degree_sum"))
                        .cast("decimal(38,0)"))
            .withColumn("q_share",
                        F.round(F.col("contrib").cast("double") / F.lit(denom),
                                6)))


def modularity_score(edges: DataFrame, labels: DataFrame,
                     label_col: str = "community") -> float:
    """Scalar modularity Q of a labeling (Σ contrib / 4m²) — exact-integer
    numerator summed distributedly, one final float division."""
    und = _undirected_simple(edges)
    m = und.count()
    if m == 0:
        return 0.0
    num = (modularity(edges, labels, label_col)
           .agg(F.sum("contrib").alias("n")).collect()[0]["n"])
    return float(num or 0) / float(4 * m * m)


# same sizing rationale as pagerank's broadcast_max_vertices: vertex-sized
# (id, label/degree) tables up to 2M rows are tens of MB broadcast — well
# inside a modest executor heap; raise explicitly on beefier deployments
_LOUVAIN_BROADCAST_MAX = 2_000_000

# A/B switch for the adj hash-partitioning plan below (plan choice only —
# results are bit-identical either way); module-level so a single-session
# alternated A/B can toggle it without code swaps.
_LOUVAIN_ADJ_PARTITION = True

# measurement aid (r12): per-round accept/reject + wall-clock trace, off by
# default; enables action-schedule profiling without touching results
import os as _os  # noqa: E402

_LOUVAIN_TRACE = bool(_os.environ.get("LOUVAIN_TRACE"))
# r12 A/B toggle (measurement only): disables the speculative next-round
# fusion so alternated A/B pairs can isolate its effect.  Production
# gating is `small` (the broadcast regime) — see _louvain_rounds.
_LOUVAIN_NO_SPEC = bool(_os.environ.get("LOUVAIN_NO_SPEC"))
# r12 probe, MEASURED NEUTRAL AND REVERTED (guide §1.1): running the
# id-keyed vertex-scale joins (side, enriched⋈side, lab⟕best, deg⋈lab)
# as plain co-partitioned joins instead of broadcasts did NOT drop the
# job count (136 → 141) or the wall clock (41.9/45.9 → 41.3/41.2
# alternated): the planner does not see the checkpoint/cache hash(id)
# co-partitioning at plan time, inserts exchanges, and AQE then demotes
# them back to broadcast joins — paying a shuffle write on top of the
# broadcast build.  The explicit broadcast-under-guard posture stands.


def _bcast_if(df: DataFrame, small: bool) -> DataFrame:
    """Pagerank's broadcast-under-guard posture as a helper: the Louvain
    machinery's side tables (labelings, degrees, community masses, move
    winners) are all VERTEX- or community-sized, so while the vertex
    count fits the guard they ship to every task and the edge-sized
    frames never shuffle for a join — only the groupBy aggregations
    shuffle.  Past the guard the caller leaves small=False and every
    join falls back to the shuffle plan (co-locatable via bucketing at
    deployment scale).  Plan choice only; results are identical."""
    return F.broadcast(df) if small else df


def _contrib_from_und(und: DataFrame, m: int, labels: DataFrame,
                      label_col: str = "community",
                      small: bool = False,
                      deg: DataFrame | None = None) -> DataFrame:
    """Per-community modularity contribs 4·m·e_c − d_c² as a one-column
    DataFrame — the shared plan behind `_numerator_from_und` and the
    fused round-1 guard (r11: two labelings' numerators collected in ONE
    action by unioning their tagged contrib frames)."""
    lab = labels.select("id", F.col(label_col).alias("_c"))
    if deg is None:
        deg = (und.select(F.col("u").alias("id"))
               .unionByName(und.select(F.col("v").alias("id")))
               .groupBy("id").agg(F.count(F.lit(1)).alias("_d")))
    lu = lab.select(F.col("id").alias("u"), F.col("_c").alias("_cu"))
    lv = lab.select(F.col("id").alias("v"), F.col("_c").alias("_cv"))
    e_c = (und.join(_bcast_if(lu, small), "u")
           .join(_bcast_if(lv, small), "v")
           .filter(F.col("_cu") == F.col("_cv"))
           .groupBy(F.col("_cu").alias("_c"))
           .agg(F.count(F.lit(1)).alias("_e")))
    d_c = (deg.join(_bcast_if(lab, small), "id")
           .groupBy("_c").agg(F.sum("_d").alias("_ds")))
    four_m = F.lit(4 * m).cast("decimal(38,0)")
    return (d_c.join(_bcast_if(e_c, small), "_c", "left")
            .select((four_m
                     * F.coalesce("_e", F.lit(0)).cast("decimal(38,0)")
                     - F.col("_ds").cast("decimal(38,0)")
                     * F.col("_ds").cast("decimal(38,0)"))
                    .alias("contrib")))


def _numerator_from_und(und: DataFrame, m: int, labels: DataFrame,
                        label_col: str = "community",
                        small: bool = False,
                        deg: DataFrame | None = None) -> int:
    """Exact-integer modularity numerator Σ (4·m·e_c − d_c²) over a
    PRECOMPUTED undirected simple edge set (the guard-loop fast path —
    one keyed aggregation instead of re-deriving und + m per probe).
    `deg` (opt-in) reuses a caller-persisted degree table — it is
    labeling-independent, so guard loops compute it once; `small`
    broadcasts the vertex-sized sides (see _bcast_if)."""
    if m == 0:
        return 0
    contrib = _contrib_from_und(und, m, labels, label_col, small, deg)
    n = contrib.agg(F.sum("contrib").alias("n")).collect()[0]["n"]
    return int(n or 0)


def _local_move_proposal(und: DataFrame, lab: DataFrame, m: int,
                         small: bool = False,
                         deg: DataFrame | None = None,
                         adj: DataFrame | None = None,
                         parity: int | None = None,
                         identity: bool = False) -> DataFrame:
    """UNGUARDED synchronous local-move proposal over a precomputed
    undirected simple edge set: every vertex v evaluates moving to each
    NEIGHBOR community c, scoring by the exact integer gain

        ΔQ·4m² = 4m·(k_{v,c} − k_{v,c_v∖v}) − 2·k_v·(d_c − (d_{c_v} − k_v))

    (k_{v,c} = edges from v into c, d_c = community degree sum, k_v = v's
    degree), takes the best strictly-positive move (ties → smallest
    community id, argmax-then-min — no id negation, type-safe for any
    ordered id), and applies all winning moves SIMULTANEOUSLY.  `lab` is
    (id, _c); returns the proposed (id, _c).  Callers guard acceptance
    with `_numerator_from_und`.

    `deg`/`adj` (opt-in) reuse caller-persisted iteration invariants —
    both are labeling-independent, so guard loops derive them once
    instead of per round.  `small` ships every vertex/community-sized
    side table broadcast (_bcast_if) so the only shuffles left are the
    aggregations themselves.  r10 plan: TWO edge-scale passes total
    (adj→nbr aggregation, nbr→per-vertex min_by argmax) — the old shape
    recomputed the nbr/cand chain twice through an mx self-join.

    `identity=True` (r11, guide §2.4): the caller asserts `lab` IS the
    singleton labeling (_c == id for every vertex).  Then every
    label-dependent intermediate is a pure projection of the persisted
    invariants — nbr ≡ adj with cand=b, k_to=1 (und is simple, so each
    (id, b) occurs once); d_c ≡ deg (each community is one vertex);
    side ≡ deg with _c=id, d_cur=_d — which deletes the edge-scale
    (id, cand) aggregation exchange and both label joins from the
    ROUND-1 plan.  The downstream scoring/argmax code is shared, so the
    winner, gain and parity decisions are expression-identical."""
    if deg is None:
        deg = (und.select(F.col("u").alias("id"))
               .unionByName(und.select(F.col("v").alias("id")))
               .groupBy("id").agg(F.count(F.lit(1)).alias("_d")))
    if adj is None:
        adj = (und.select(F.col("u").alias("id"), F.col("v").alias("b"))
               .unionByName(
                   und.select(F.col("v").alias("id"), F.col("u").alias("b"))))
    if identity:
        nbr = adj.select("id", F.col("b").alias("cand"),
                         F.lit(1).cast("long").alias("k_to"))
        d_c = deg.select(F.col("id").alias("cand"),
                         F.col("_d").alias("d_cand"))
        side = deg.select("id", F.col("id").alias("_c"), "_d",
                          F.col("_d").alias("d_cur"))
        lab = deg.select("id", F.col("id").alias("_c"))
    else:
        # k_{v,c}: edge count from each vertex into each neighbor community
        nbr = (adj.join(_bcast_if(lab.select(F.col("id").alias("b"),
                                             F.col("_c").alias("cand")),
                                  small), "b")
               .groupBy("id", "cand").agg(F.count(F.lit(1)).alias("k_to")))
        d_c = (deg.join(_bcast_if(lab, small), "id")
               .groupBy(F.col("_c").alias("cand"))
               .agg(F.sum("_d").alias("d_cand")))
        side = (lab.join(_bcast_if(deg, small), "id")
                .join(_bcast_if(d_c.select(F.col("cand").alias("_c"),
                                           F.col("d_cand").alias("d_cur")),
                                small), "_c"))

    def _dec(c) -> Column:
        return F.col(c).cast("decimal(38,0)")

    four_m = F.lit(4 * m).cast("decimal(38,0)")
    two = F.lit(2).cast("decimal(38,0)")
    # r10 single-pass argmax (see _weighted_move_proposal): per-vertex
    # constants shift every candidate's gain equally, so one min_by over
    # the partial score p = 4m·k_to − 2·k_v·d_cand picks the identical
    # winner and the full gain gates only that one row.
    # r12 (guide §2.4): the FULL side table (incl. d_cur) joins enriched
    # once and its per-vertex constants ride the argmax as EXTRA GROUP
    # KEYS — _c/_d/d_cur are functions of id, so the groups (and the
    # min_by winner) are identical, hash(id) still satisfies the
    # clustered distribution, and the old second side broadcast + the
    # scored join stage disappear from every round's critical path.
    enriched = (nbr.join(_bcast_if(d_c, small), "cand")
                .join(_bcast_if(side.select("id", "_c", "_d", "d_cur"),
                                small), "id"))
    p = four_m * _dec("k_to") - two * _dec("_d") * _dec("d_cand")
    is_own = F.when(F.col("cand") == F.col("_c"), F.lit(1)).otherwise(
        F.lit(0))
    ordk = F.struct(is_own.alias("o"), (-p).alias("np"),
                    F.col("cand").alias("c"))
    agg = (enriched.groupBy("id", "_c", "_d", "d_cur")
           .agg(F.min_by(F.struct(F.col("cand").alias("c"),
                                  F.col("k_to").alias("kt"),
                                  F.col("d_cand").alias("dc")),
                         ordk).alias("win"),
                F.max(F.when(F.col("cand") == F.col("_c"),
                             F.col("k_to"))).alias("k_own")))
    scored = (agg
              .withColumn(
                  "gain",
                  four_m * (F.col("win.kt").cast("decimal(38,0)")
                            - F.coalesce(F.col("k_own")
                                         .cast("decimal(38,0)"),
                                         F.lit(0).cast("decimal(38,0)")))
                  - two * _dec("_d")
                  * (F.col("win.dc").cast("decimal(38,0)")
                     - (F.col("d_cur").cast("decimal(38,0)")
                        - _dec("_d")))))
    moved = (F.col("win.c") != F.col("_c")) & (F.col("gain") > 0)
    if parity is not None:
        # the level-2 symmetry breaker, now available at level 1 too
        # (r10): only vertices whose deterministic md5 bit matches move
        # this round — a fully synchronous sweep from singletons swaps
        # whole neighborhoods simultaneously and the guard rejects the
        # permuted-but-no-better result, so unparitied level-1 rounds
        # accept nothing on symmetric-ish graphs (measured at sf0.1)
        bit = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 1),
                      16, 10).cast("int") % 2)
        moved = moved & (bit == F.lit(parity))
    best = (scored.filter(moved)
            .select("id", F.col("win.c").alias("_new")))
    return (lab.join(_bcast_if(best, small), "id", "left")
            .select("id", F.coalesce("_new", F.col("_c")).alias("_c")))


def modularity_local_move(edges: DataFrame, labels: DataFrame,
                          label_col: str = "community") -> DataFrame:
    """One GUARDED synchronous Louvain-style local-move round on top of an
    existing labeling (e.g. label_propagation output) — the proposal shape
    is `_local_move_proposal` (see its docstring for the exact-integer
    gain formula and tie-breaks).

    Synchronous application can oscillate on symmetric graphs (the known
    parallel-Louvain caveat), so the round is guarded: modularity of the
    proposed labeling is compared against the input's — in exact integer
    numerators, same denominator — and the input labeling is returned
    unchanged unless the round strictly improved it.  The returned
    labeling therefore NEVER has lower modularity than the input.

    Cost: three keyed aggregations + small-dimension joins + ONE O(m)
    guard aggregation (the input's numerator is recomputed here because
    this is the stateless public entry; `louvain` threads numerators
    through its loop and skips it), nothing quadratic; candidate set is
    bounded by the neighbor-community count, itself bounded by degree.
    Returns (id, <label_col>)."""
    out_cols = ["id", label_col]
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    m = und.count()
    if m == 0:
        return labels.select(*out_cols)
    lab = (labels.select("id", F.col(label_col).alias("_c"))
           .localCheckpoint(eager=True))
    small = lab.count() <= _LOUVAIN_BROADCAST_MAX
    proposed = (_local_move_proposal(und, lab, m, small=small)
                .withColumnRenamed("_c", label_col)
                .localCheckpoint(eager=True))
    # monotone guard: exact integer numerators, same 4m² denominator
    q_old = _numerator_from_und(
        und, m, lab.withColumnRenamed("_c", label_col), label_col,
        small=small)
    q_new = _numerator_from_und(und, m, proposed, label_col, small=small)
    if q_new > q_old:
        return proposed
    return labels.select(*out_cols)


def _louvain_invariants(und: DataFrame,
                        small: bool = True) -> tuple[DataFrame, DataFrame]:
    """The labeling-independent Louvain level-1 iteration invariants,
    persisted: the degree table and the symmetric adjacency.

    r11 (guide §2.4, the greedy_coloring idiom): the adjacency is
    hash-partitioned on `id` ONCE before the persist, so under the
    broadcast regime (`small`) BOTH edge-scale aggregations of every
    round's proposal — groupBy(id, cand) and the min_by argmax
    groupBy(id) — reuse the cached partitioning (hash(id) satisfies both
    clustered distributions; broadcast joins preserve it) instead of
    paying two edge-scale Exchanges per round.  One up-front exchange
    buys 2×rounds of them; results are bit-identical (exact
    integer/decimal aggregates, total-order min_by key).  Executed-plan
    pin: tests/test_graph_ops.py::test_louvain_proposal_round_exchange_free.
    r12 (ADVICE r11): the repartition is gated on the BROADCAST regime —
    past the guard (small=False) the per-round joins shuffle by other
    keys anyway, so the up-front edge-scale exchange would be pure
    overhead."""
    deg = (und.select(F.col("u").alias("id"))
           .unionByName(und.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("_d"))).persist()
    adj_base = (und.select(F.col("u").alias("id"), F.col("v").alias("b"))
                .unionByName(
                    und.select(F.col("v").alias("id"), F.col("u").alias("b"))))
    adj = (adj_base.repartition("id") if _LOUVAIN_ADJ_PARTITION and small
           else adj_base).persist()
    return deg, adj


def _louvain_rounds(und: DataFrame, m: int, cur: DataFrame,
                    label_col: str, max_rounds: int,
                    small: bool = False,
                    init_singletons: bool = False) -> tuple[DataFrame, int, bool]:
    """Guarded local-move rounds with the modularity numerator THREADED
    through the loop: each round costs the proposal joins plus exactly ONE
    O(m) numerator aggregation (the previous round's accepted numerator is
    reused as the guard baseline instead of being recomputed — the r8
    plan-audit fix; accept decisions are identical because q_old of round
    t always equals the accepted q of round t−1).  Guards compare EXACT
    integer numerators at every scale (a float Q comparison can collapse
    a genuine integer improvement once numerators exceed 2^53).
    r10: the labeling-independent degree and adjacency tables are
    derived ONCE and persisted across rounds, and `small` threads the
    broadcast-under-guard plan into every proposal/guard join.  Rounds
    alternate the md5-parity symmetry breaker (level 2's posture,
    brought to level 1): a fully synchronous sweep from singletons
    swaps whole neighborhoods at once and the guard rejects the
    permuted-but-no-better labeling — measured at sf0.1, unparitied
    level 1 accepted NOTHING, leaving the contraction an identity.
    All max_rounds run (a rejected round's successor proposes a
    DIFFERENT move set under the flipped parity), which is exactly the
    unconditional unroll the SQL oracle replays.
    Returns (labels, final numerator, any round accepted).

    r11 action budget: the baseline numerator is NOT its own job any
    more — round 1's guard action computes BOTH numerators at once by
    unioning the proposed labeling's tagged contrib frame with the
    baseline's (for `init_singletons` the baseline contrib is the
    closed form −d_v² per vertex over the persisted degree table, so it
    adds a vertex-sized branch to an O(m) job; callers that BUILT the
    identity labeling opt in and `cur` is re-derived from `deg` here —
    zero extra shuffle, identical domain).  One eager action per round,
    none before."""
    if m == 0:
        if cur is None:  # singleton start over an empty edge set
            cur = und.select(F.col("u").alias("id"),
                             F.col("u").alias(label_col))
        return cur, _numerator_from_und(und, m, cur, label_col), False
    deg, adj = _louvain_invariants(und, small)
    try:
        if init_singletons:
            # the identity labeling over the und vertex domain IS
            # deg's key set — reuse the persisted table instead of a
            # caller-side distinct
            cur = deg.select("id", F.col("id").alias(label_col))
        prev_num: int | None = None
        if max_rounds <= 0:
            prev_num = _numerator_from_und(und, m, cur, label_col,
                                           small=small, deg=deg)
        moved = False
        consecutive_rejects = 0
        # r11: while no proposal has been ACCEPTED yet from a singleton
        # start, the current labeling is still the identity, so the
        # proposal can take the label-join-free identity fast path (a
        # rejected round leaves the labeling unchanged — the invariant
        # survives rejections, only an accept clears it)
        is_identity = init_singletons

        def _mk_proposal(base: DataFrame, parity: int,
                         identity: bool) -> DataFrame:
            # lazy checkpoint: the guard's numerator aggregation is the
            # next action anyway, so it materializes the checkpoint as a
            # side effect — one fewer eager job on the round's critical
            # path (round count is bounded, so plan depth stays bounded)
            lab = base.select("id", F.col(label_col).alias("_c"))
            return (_local_move_proposal(und, lab, m, small=small,
                                         deg=deg, adj=adj, parity=parity,
                                         identity=identity)
                    .withColumnRenamed("_c", label_col)
                    .localCheckpoint(eager=False))

        def _tagged(labels: DataFrame, tag: str) -> DataFrame:
            return _contrib_from_und(und, m, labels, label_col,
                                     small=small, deg=deg) \
                .select(F.lit(tag).alias("t"), "contrib")

        # r12 speculation (guide §2.6 — overlap independent work): each
        # fused action computes the CURRENT proposal's numerator AND, on
        # the accept-assumed branch, the NEXT round's proposal +
        # numerator (the next proposal is a deterministic function of
        # (labeling, parity), so when the accept lands — the measured
        # common case — the following round costs zero actions and its
        # job latency already overlapped this action's).  A rejected
        # round discards the speculative branch and round i+1 re-derives
        # from the unchanged labeling — decisions stay bit-identical to
        # the sequential schedule because every (base, parity, prev_num)
        # triple is the same.  Gated on the broadcast regime: past the
        # guard the per-round jobs are compute-bound edge-scale shuffles
        # where wasted speculative work is real money, and the latency
        # this overlaps no longer dominates.
        speculate = small and not _LOUVAIN_NO_SPEC
        pending: tuple[DataFrame, int] | None = None
        i = 0
        while i < max_rounds:
            if pending is not None:
                proposed, num = pending
                pending = None
                spec = None  # consumed; the next fused action re-arms
            else:
                proposed = _mk_proposal(cur, i % 2, is_identity)
                branches = [_tagged(proposed, "n")]
                if prev_num is None:
                    # fused round-1 guard: baseline numerator rides the
                    # same collect
                    if init_singletons:
                        # singleton closed form: e_c = 0 ⇒ contrib = −d_v²
                        d38 = F.col("_d").cast("decimal(38,0)")
                        branches.append(
                            deg.select(F.lit("b").alias("t"),
                                       (-(d38 * d38)).alias("contrib")))
                    else:
                        branches.append(_tagged(cur, "b"))
                spec_prop = None
                if speculate and i + 1 < max_rounds:
                    spec_prop = _mk_proposal(proposed, (i + 1) % 2, False)
                    branches.append(_tagged(spec_prop, "s"))
                uni = branches[0]
                for b in branches[1:]:
                    uni = uni.unionByName(b)
                rows = {r["t"]: int(r["n"] or 0)
                        for r in uni.groupBy("t")
                        .agg(F.sum("contrib").alias("n")).collect()}
                num = rows.get("n", 0)
                if prev_num is None:
                    prev_num = rows.get("b", 0)
                spec = ((spec_prop, rows.get("s", 0))
                        if spec_prop is not None else None)
            if _LOUVAIN_TRACE:
                import time as _t
                print(f"# louvain L1 round {i} parity {i % 2}: "
                      f"num={num} prev={prev_num} "
                      f"{'ACCEPT' if num > prev_num else 'reject'} "
                      f"t={_t.perf_counter():.2f}", flush=True)
            # continue, not break: rounds alternate the parity bit, so a
            # rejected round's SUCCESSOR proposes a different move set
            # (the pre-r10 break was only valid while proposals were a
            # function of the labeling alone); the unconditional loop is
            # exactly what the SQL oracle unrolls.  EXCEPT: after two
            # CONSECUTIVE rejections the labels are unchanged across
            # both parities, so every later round replays one of the
            # two rejected proposals — breaking is label-identical to
            # the oracle's unroll (its CASE makes rejected rounds
            # no-ops) and skips the dead O(m) work
            if num <= prev_num:
                consecutive_rejects += 1
                # the speculative branch assumed an accept: discard it
                if consecutive_rejects >= 2:
                    break
                i += 1
                continue
            consecutive_rejects = 0
            cur, prev_num, moved = proposed, num, True
            is_identity = False
            pending = spec
            i += 1
    finally:
        deg.unpersist()
        adj.unpersist()
    return cur, prev_num, moved


def louvain(edges: DataFrame, labels: DataFrame | None = None,
            label_col: str = "community", max_rounds: int = 5) -> DataFrame:
    """Louvain-style community refinement: repeated guarded local-move
    rounds from an initial labeling (default: singleton communities over
    the undirected simple vertex domain — the classic Louvain start; the
    und-derived domain matches `louvain_full` and the SQL oracle, so
    self-loop-only vertices — modularity-neutral by definition — are
    consistently excluded) for max_rounds parity-alternated rounds (r10;
    see _louvain_rounds — a rejected round leaves the labeling unchanged
    and the next parity proposes a different move set).  Each round is
    monotone by the exact-integer numerator guard, so the modularity
    sequence is non-decreasing.

    This is the LOCAL-MOVE phase only — `louvain_full` adds the
    contraction phase.  Returns (id, <label_col>)."""
    und, m, n = _und_stats(edges)
    small = n <= _LOUVAIN_BROADCAST_MAX
    singles = labels is None
    if singles:
        cur = None  # _louvain_rounds derives the identity from deg
    else:
        cur = labels.select("id", label_col).localCheckpoint(eager=True)
    out, _, _ = _louvain_rounds(und, m, cur, label_col, max_rounds,
                                small=small, init_singletons=singles)
    return out


def _und_stats(edges: DataFrame) -> tuple[DataFrame, int, int]:
    """Lazy-checkpointed undirected simple edge set plus (m, n) in ONE
    action (r11 action budget): the stats aggregation over the exploded
    endpoint column materializes the checkpoint as a side effect, so
    callers no longer pay a separate eager-checkpoint job + count + a
    vertex-distinct job just to size broadcast decisions."""
    und = _undirected_simple(edges).localCheckpoint(eager=False)
    row = (und.select(F.explode(F.array("u", "v")).alias("id"))
           .agg(F.count(F.lit(1)).alias("c2"),
                F.countDistinct("id").alias("n")).collect()[0])
    return und, int(row["c2"]) // 2, int(row["n"])


def _modularity_numerator(edges: DataFrame, labels: DataFrame,
                          label_col: str = "community") -> int:
    """Exact-integer modularity numerator Σ contrib = Σ (4·m·e_c − d_c²)
    of a labeling (Q = numerator / 4m²) — the monotone-guard currency."""
    und = _undirected_simple(edges).localCheckpoint(eager=True)
    return _numerator_from_und(und, und.count(), labels, label_col)


def _numerator_from_sed(sed: DataFrame, m: int, slab: DataFrame,
                        small: bool = False,
                        wdeg: DataFrame | None = None) -> int:
    """Exact-integer modularity numerator Σ (4·m·e_c − d_c²) computed on
    the CONTRACTED weighted super-graph — provably equal to
    `_numerator_from_und` on the original graph for any labeling of the
    super-vertices (the louvain_full docstring's own equivalence, used
    here as the guard): contraction preserves both terms exactly.
    e_c (original intra-community edge count) = Σ w of plain super-edges
    whose endpoints share a community + Σ w of self-loops in it (each
    self-loop's w IS the intra-super-vertex original-edge count, counted
    once); d_c (community degree mass) = Σ super-vertex weighted degrees,
    where a plain super-edge contributes w to each endpoint and a
    self-loop 2w (Newman) — exactly Σ of the member vertices' original
    degrees.  One super-graph-sized aggregation instead of an O(m)
    original-graph pass, so the level-2 probe loop never touches the
    original edge set (VERDICT r9 #4: one O(m) pass per accepted LEVEL,
    not per probed round)."""
    if m == 0:
        return 0
    contrib = _contrib_from_sed(sed, m, slab, small=small, wdeg=wdeg)
    n = contrib.agg(F.sum("contrib").alias("n")).collect()[0]["n"]
    return int(n or 0)


def _contrib_from_sed(sed: DataFrame, m: int, slab: DataFrame,
                      small: bool = False,
                      wdeg: DataFrame | None = None) -> DataFrame:
    """Per-community contrib frame behind `_numerator_from_sed` — factored
    out (r12) so the speculative round fusion can collect two labelings'
    contracted-graph numerators in one tagged-union action."""
    plain = sed.filter(F.col("u2") != F.col("v2"))
    loops = sed.filter(F.col("u2") == F.col("v2"))
    su = slab.select(F.col("sid").alias("u2"), F.col("sc").alias("_cu"))
    sv = slab.select(F.col("sid").alias("v2"), F.col("sc").alias("_cv"))
    e_c = (plain.join(_bcast_if(su, small), "u2")
           .join(_bcast_if(sv, small), "v2")
           .filter(F.col("_cu") == F.col("_cv"))
           .select(F.col("_cu").alias("_c"), "w")
           .unionByName(loops.join(_bcast_if(su, small), "u2")
                        .select(F.col("_cu").alias("_c"), "w"))
           .groupBy("_c").agg(F.sum("w").alias("_e")))
    if wdeg is None:
        wdeg = (plain.select(F.col("u2").alias("sid"), "w")
                .unionByName(plain.select(F.col("v2").alias("sid"), "w"))
                .unionByName(loops.select(F.col("u2").alias("sid"),
                                          (F.col("w") * 2).alias("w")))
                .groupBy("sid").agg(F.sum("w").alias("_d")))
    d_c = (wdeg.join(_bcast_if(slab, small), "sid")
           .groupBy(F.col("sc").alias("_c"))
           .agg(F.sum("_d").alias("_ds")))
    four_m = F.lit(4 * m).cast("decimal(38,0)")
    return (d_c.join(_bcast_if(e_c, small), "_c", "left")
            .select((four_m
                     * F.coalesce("_e", F.lit(0)).cast("decimal(38,0)")
                     - F.col("_ds").cast("decimal(38,0)")
                     * F.col("_ds").cast("decimal(38,0)"))
                    .alias("contrib")))


def _weighted_move_proposal(sedges: DataFrame, slab: DataFrame,
                            m: int, parity: int | None = None,
                            small: bool = False,
                            wdeg: DataFrame | None = None,
                            adj: DataFrame | None = None,
                            identity: bool = False) -> DataFrame:
    """One synchronous weighted local-move proposal on a contracted
    (super-vertex) graph — the level-2+ Louvain step.

    `sedges` is the canonical weighted super-graph (u2 <= v2, integer
    weight w = number of original edges between the two super-vertices;
    u2 == v2 rows are self-loops carrying intra-community edge counts).
    `slab` maps super-vertex sid -> community sc.  Total weight is the
    ORIGINAL graph's m, so gains share the original 4m² denominator and
    a gain here IS a gain on the original graph (standard Louvain
    equivalence).  Weighted degree counts self-loops twice (Newman).
    Self-loops never enter the candidate set — they move with their
    vertex.  Deterministic tie-break: argmax gain, then smallest
    community id (the modularity_local_move contract).

    `parity` (0 or 1): when set, only super-vertices whose deterministic
    md5 bit equals it may move this round — the standard parallel-Louvain
    symmetry breaker.  A fully synchronous sweep on a symmetric structure
    (ring, cycle) has every vertex swap simultaneously, producing a
    permuted-but-no-better labeling that the guard then rejects; holding
    half the vertices still each round lets the other half's moves
    actually land.  The bit is engine-portable (first md5 hex nibble mod
    2), so the SQL oracle replays the same schedule.

    Returns (sid, sc) with winning strictly-positive moves applied
    simultaneously — UNGUARDED; the caller guards with the exact
    numerator (contracted-graph form, see _numerator_from_sed).

    r10 plan (rule 34): TWO edge-scale passes — adj→nbr aggregation,
    then ONE min_by argmax over the partial score 4m·k_to − 2·_d·d_cand
    (per-sid constants shift every candidate's gain equally, so the
    winner is identical and the exact gain gates only the winner row);
    `wdeg`/`adj` opt-in reuse caller-persisted level invariants and
    `small` broadcasts the vertex/community-sized side tables."""
    plain = sedges.filter(F.col("u2") != F.col("v2"))
    loops = sedges.filter(F.col("u2") == F.col("v2")) \
        .select(F.col("u2").alias("sid"), (F.col("w") * 2).alias("lw"))
    if wdeg is None:
        wdeg = (
            plain.select(F.col("u2").alias("sid"), "w")
            .unionByName(plain.select(F.col("v2").alias("sid"), "w"))
            .unionByName(loops.select("sid", F.col("lw").alias("w")))
            .groupBy("sid").agg(F.sum("w").alias("_d"))
        )
    if adj is None:
        adj = (
            plain.select(F.col("u2").alias("sid"), F.col("v2").alias("b"), "w")
            .unionByName(
                plain.select(F.col("v2").alias("sid"), F.col("u2").alias("b"),
                             "w"))
        )
    if identity:
        # r11 identity fast path (see _local_move_proposal): from the
        # per-level singleton start, cand = the neighbor super-vertex
        # itself and k_to = the super-edge weight ((sid, b) is unique in
        # the canonical adjacency), d_c ≡ wdeg, side ≡ wdeg — the
        # label joins and the (sid, cand) aggregation exchange vanish
        # from each level's round-1 plan; downstream scoring is shared.
        nbr = adj.select("sid", F.col("b").alias("cand"),
                         F.col("w").alias("k_to"))
        d_c = wdeg.select(F.col("sid").alias("cand"),
                          F.col("_d").alias("d_cand"))
        side = wdeg.select("sid", F.col("sid").alias("sc"), "_d",
                           F.col("_d").alias("d_cur"))
        slab = wdeg.select("sid", F.col("sid").alias("sc"))
    else:
        nbr = (adj.join(_bcast_if(slab.select(F.col("sid").alias("b"),
                                              F.col("sc").alias("cand")),
                                  small), "b")
               .groupBy("sid", "cand").agg(F.sum("w").alias("k_to")))
        d_c = (wdeg.join(_bcast_if(slab, small), "sid")
               .groupBy(F.col("sc").alias("cand"))
               .agg(F.sum("_d").alias("d_cand")))
        # per-vertex constants (community, own weighted degree, own
        # community's mass) — vertex-sized, meets the flow in broadcast
        # joins
        side = (slab.join(_bcast_if(wdeg, small), "sid")
                .join(_bcast_if(d_c.select(F.col("cand").alias("sc"),
                                           F.col("d_cand").alias("d_cur")),
                                small), "sc"))

    def _dec(c) -> Column:
        return F.col(c).cast("decimal(38,0)")

    four_m = F.lit(4 * m).cast("decimal(38,0)")
    two = F.lit(2).cast("decimal(38,0)")
    # r10 single-pass argmax: for a fixed sid, k_own / d_cur / _d shift
    # every candidate's gain by the SAME constant, so
    # argmax(gain) == argmax(p) with p = 4m·k_to − 2·_d·d_cand, and the
    # full gain formula only needs evaluating on the one winner row.
    # One min_by aggregation replaces the old mx-join + second cand pass
    # (which recomputed the edge-scale nbr/cand chain twice); the own-
    # community row rides along ranked strictly last (is_own flag) so no
    # pre-filter pass is needed — a winner equal to sc simply doesn't
    # move, exactly the old coalesce semantics.
    # r12 (guide §2.4, same as _local_move_proposal): full side joins
    # enriched once; its per-vertex constants become extra group keys
    # (functions of sid — identical groups, identical winner, hash(sid)
    # still clusters), deleting the second side broadcast + scored join.
    enriched = (nbr.join(_bcast_if(d_c, small), "cand")
                .join(_bcast_if(side.select("sid", "sc", "_d", "d_cur"),
                                small), "sid"))
    p = four_m * _dec("k_to") - two * _dec("_d") * _dec("d_cand")
    is_own = F.when(F.col("cand") == F.col("sc"), F.lit(1)).otherwise(
        F.lit(0))
    ordk = F.struct(is_own.alias("o"), (-p).alias("np"),
                    F.col("cand").alias("c"))
    agg = (enriched.groupBy("sid", "sc", "_d", "d_cur")
           .agg(F.min_by(F.struct(F.col("cand").alias("c"),
                                  F.col("k_to").alias("kt"),
                                  F.col("d_cand").alias("dc")),
                         ordk).alias("win"),
                F.max(F.when(F.col("cand") == F.col("sc"),
                             F.col("k_to"))).alias("k_own")))
    scored = (agg
              .withColumn(
                  "gain",
                  four_m * (F.col("win.kt").cast("decimal(38,0)")
                            - F.coalesce(F.col("k_own")
                                         .cast("decimal(38,0)"),
                                         F.lit(0).cast("decimal(38,0)")))
                  - two * _dec("_d")
                  * (F.col("win.dc").cast("decimal(38,0)")
                     - (F.col("d_cur").cast("decimal(38,0)")
                        - _dec("_d")))))
    moved = (F.col("win.c") != F.col("sc")) & (F.col("gain") > 0)
    if parity is not None:
        bit = (F.conv(F.substring(F.md5(F.col("sid").cast("string")), 1, 1),
                      16, 10).cast("int") % 2)
        moved = moved & (bit == F.lit(parity))
    best = (scored.filter(moved)
            .select("sid", F.col("win.c").alias("_new")))
    return (slab.join(_bcast_if(best, small), "sid", "left")
            .select("sid", F.coalesce("_new", F.col("sc")).alias("sc")))


def louvain_full(edges: DataFrame, label_col: str = "community",
                 level1_rounds: int = 5, level2_rounds: int = 4,
                 max_levels: int = 3,
                 _capture: dict | None = None) -> DataFrame:
    """FULL Louvain: the local-move phase (`louvain`) plus the contraction
    phase — communities contract to super-vertices (one groupBy relabel;
    super-edge weight = inter-community edge count, self-loop weight =
    intra count), weighted local-move rounds run on the contracted graph,
    and accepted labelings project back to the original vertices.
    Contraction ITERATES (r11, VERDICT r10 #6): while a contracted level
    accepts at least one round and levels remain under `max_levels`, the
    accepted super-graph contracts again — the standard Louvain
    "loop until no level improves" termination, capped for oracle
    replayability.  Default max_levels=3 (two contraction levels).

    Monotone guard: every contracted-round proposal is scored with the
    exact-integer modularity numerator ON THE CONTRACTED GRAPH
    (`_numerator_from_sed` — provably equal to the original-graph
    numerator for any super-vertex labeling, proof in its docstring; same
    4m² denominator throughout, so accept decisions are bit-identical to
    scoring the projection on the original graph); a proposal is accepted
    only on STRICT improvement, so modularity never decreases across
    rounds or levels.  Rounds alternate the parity symmetry-breaker (see
    `_weighted_move_proposal`; since r10 level 1 alternates it too) — a
    rejected round leaves the labeling unchanged (the proposal is a
    deterministic function of the labeling and parity, so re-running it
    later is a no-op), which makes the loop exactly replayable by an
    unconditionally unrolled SQL oracle; two CONSECUTIVE rejections are a
    fixpoint across both parities, so the loop breaks there —
    label-identical to the unroll, skipping only dead work.  Likewise a
    level that accepts nothing terminates the level loop: an oracle that
    unconditionally unrolls deeper levels replays the rejected proposals
    (same identity start, same parities) and rejects them again, so the
    break is label-identical.

    Scale / action budget (r11): level ℓ ≥ 3 contracts the PREVIOUS
    super-graph by its accepted labeling instead of re-grouping the
    original edge set — exactly equal (each sed row's w sums the
    original edges between two super-vertices, and every one of those
    edges maps to the same community pair), so only level 2's
    contraction is O(m).  Projection back to original vertices happens
    ONCE after the level loop (accepted per-level mappings composed
    left-to-right), followed by ONE O(m) original-graph numerator pass
    that re-derives the threaded accepted numerator as a never-wrong
    consistency check of the whole contraction chain (previously this
    projection + check ran per accepted level).  The undirected edge
    set is derived once (`_und_stats` — stats and checkpoint fused into
    one action) and the accepted numerator is threaded through every
    level.

    `_capture` (private): when a dict is passed, the already-computed
    exact numerators are recorded into it — "level1_num" (the
    local-move-only labeling's, identical to what a standalone
    `louvain(edges, max_rounds=level1_rounds)` run would re-derive) and
    "final_num" (the returned labeling's) — so certificate-emitting
    callers don't re-run level 1 or re-aggregate O(m) numerators.
    Returns (id, <label_col>)."""
    und, m, n = _und_stats(edges)
    small = n <= _LOUVAIN_BROADCAST_MAX
    cur, prev_num, moved1 = _louvain_rounds(und, m, None, label_col,
                                            level1_rounds, small=small,
                                            init_singletons=True)
    if _capture is not None:
        _capture["level1_num"] = prev_num
    if m == 0:
        if _capture is not None:
            _capture["final_num"] = prev_num
        return cur
    contracted = moved1
    base_lab = cur.select("id", F.col(label_col).alias("_c"))
    maps: list[DataFrame] = []   # accepted per-level sid→sc mappings
    prev_sed: DataFrame | None = None
    for _ in range(1, max_levels):
        if prev_sed is None:
            if contracted:
                lu = base_lab.select(F.col("id").alias("u"),
                                     F.col("_c").alias("cu"))
                lv = base_lab.select(F.col("id").alias("v"),
                                     F.col("_c").alias("cv"))
                sed = (
                    und.join(_bcast_if(lu, small), "u")
                    .join(_bcast_if(lv, small), "v")
                    .select(F.least("cu", "cv").alias("u2"),
                            F.greatest("cu", "cv").alias("v2"))
                    .groupBy("u2", "v2").agg(F.count(F.lit(1)).alias("w"))
                    .localCheckpoint(eager=True)
                )
            else:
                # identity-contraction elision (r10): when no local-move
                # round accepted, the labeling IS the identity, so the
                # contracted graph is the undirected edge set with unit
                # weights (no self-loops possible) — skip the O(m)
                # groupBy entirely (und is already checkpointed)
                sed = und.select(F.col("u").alias("u2"),
                                 F.col("v").alias("v2"),
                                 F.lit(1).cast("long").alias("w"))
        else:
            # level ≥ 3: contract the previous SUPER-graph by its
            # accepted mapping — provably equal to contracting the
            # original graph by the composed labeling (every original
            # edge inside a prev-sed row shares that row's community
            # pair), and super-graph-sized instead of O(m)
            mu = maps[-1].select(F.col("sid").alias("u2"),
                                 F.col("sc").alias("cu"))
            mv = maps[-1].select(F.col("sid").alias("v2"),
                                 F.col("sc").alias("cv"))
            sed = (
                prev_sed.join(_bcast_if(mu, small), "u2")
                .join(_bcast_if(mv, small), "v2")
                .select(F.least("cu", "cv").alias("u2"),
                        F.greatest("cu", "cv").alias("v2"), "w")
                .groupBy("u2", "v2").agg(F.sum("w").alias("w"))
                .localCheckpoint(eager=True)
            )
        # level-invariant tables (labeling-independent): weighted degree
        # and symmetric adjacency of the super-graph, derived once and
        # persisted across every probe round of this level; the identity
        # start labeling reads off wdeg's key set (no separate distinct)
        plain = sed.filter(F.col("u2") != F.col("v2"))
        wdeg = (plain.select(F.col("u2").alias("sid"), "w")
                .unionByName(plain.select(F.col("v2").alias("sid"), "w"))
                .unionByName(sed.filter(F.col("u2") == F.col("v2"))
                             .select(F.col("u2").alias("sid"),
                                     (F.col("w") * 2).alias("w")))
                .groupBy("sid").agg(F.sum("w").alias("_d"))).persist()
        adj_base = (plain.select(F.col("u2").alias("sid"),
                                 F.col("v2").alias("b"), "w")
                    .unionByName(plain.select(F.col("v2").alias("sid"),
                                              F.col("u2").alias("b"), "w")))
        # same hash(sid) posture as _louvain_rounds' adj: every probe
        # round's two super-graph aggregations reuse the cached
        # partitioning under the broadcast regime (r12, ADVICE r11:
        # gated on `small` like the level-1 invariants)
        adj = (adj_base.repartition("sid")
               if _LOUVAIN_ADJ_PARTITION and small
               else adj_base).persist()
        slab = wdeg.select("sid", F.col("sid").alias("sc"))
        improved = False
        rejects = 0
        # r11: the level's labeling stays the identity until a proposal
        # is ACCEPTED (rejections leave slab unchanged), so those rounds
        # take the label-join-free identity fast path
        slab_identity = True

        def _mk_prop(base: DataFrame, parity: int,
                     identity: bool) -> DataFrame:
            # lazy checkpoint (see _louvain_rounds): the sed-numerator
            # guard materializes it in the same action
            return _weighted_move_proposal(sed, base, m, parity=parity,
                                           small=small, wdeg=wdeg,
                                           adj=adj, identity=identity) \
                .localCheckpoint(eager=False)

        def _tagged_sed(labels: DataFrame, tag: str) -> DataFrame:
            return _contrib_from_sed(sed, m, labels, small=small,
                                     wdeg=wdeg) \
                .select(F.lit(tag).alias("t"), "contrib")

        # r12 speculation — same schedule-preserving accept-assumed
        # fusion as _louvain_rounds (see its comment), on the contracted
        # graph; guard numerators stay the provably-equal sed form
        speculate = small and not _LOUVAIN_NO_SPEC
        pending: tuple[DataFrame, int] | None = None
        try:
            r = 0
            while r < level2_rounds:
                if pending is not None:
                    prop, num = pending
                    pending = None
                    spec = None
                else:
                    prop = _mk_prop(slab, r % 2, slab_identity)
                    branches = [_tagged_sed(prop, "n")]
                    spec_prop = None
                    if speculate and r + 1 < level2_rounds:
                        spec_prop = _mk_prop(prop, (r + 1) % 2, False)
                        branches.append(_tagged_sed(spec_prop, "s"))
                    uni = branches[0]
                    for b in branches[1:]:
                        uni = uni.unionByName(b)
                    rows = {row["t"]: int(row["n"] or 0)
                            for row in uni.groupBy("t")
                            .agg(F.sum("contrib").alias("n")).collect()}
                    # guard on the CONTRACTED graph: _numerator_from_sed
                    # is provably equal to the original-graph numerator
                    # for this labeling (docstring proof), so accept
                    # decisions are bit-identical while each probe costs
                    # a super-graph aggregation instead of an O(m) pass
                    num = rows.get("n", 0)
                    spec = ((spec_prop, rows.get("s", 0))
                            if spec_prop is not None else None)
                if _LOUVAIN_TRACE:
                    import time as _t
                    print(f"# louvain L2+ round {r} parity {r % 2}: "
                          f"num={num} prev={prev_num} "
                          f"{'ACCEPT' if num > prev_num else 'reject'} "
                          f"t={_t.perf_counter():.2f}", flush=True)
                if num <= prev_num:
                    # two consecutive rejections across both parities =
                    # fixpoint; later rounds replay them (see
                    # _louvain_rounds — label-identical to the oracle)
                    rejects += 1
                    if rejects >= 2:
                        break
                    r += 1
                    continue
                rejects = 0
                slab, prev_num, improved = prop, num, True
                slab_identity = False
                pending = spec
                r += 1
        finally:
            wdeg.unpersist()
            adj.unpersist()
        if not improved:
            break
        maps.append(slab)
        prev_sed = sed
        contracted = True
        if _capture is not None:
            # accepted numerator after each contracted level — the
            # monotone-across-levels certificate (non-decreasing by the
            # strict-improvement guard; pytest-pinned)
            _capture.setdefault("level_nums", []).append(prev_num)
    if maps:
        # ONE composed projection + ONE O(m) original-graph pass for the
        # whole level chain: the und numerator re-derives the threaded
        # accepted score as a never-wrong consistency check of every
        # contraction step at once.  left + coalesce: a community absent
        # from a super-edge set (possible only with caller-supplied
        # exotic labelings) keeps its previous-level label instead of
        # silently dropping its vertices
        out = base_lab
        for mp in maps:
            out = (out.join(_bcast_if(mp.withColumnRenamed("sid", "_c"),
                                      small), "_c", "left")
                   .select("id",
                           F.coalesce("sc", F.col("_c")).alias("_c")))
        cur = (out.select("id", F.col("_c").alias(label_col))
               .localCheckpoint(eager=False))
        check = _numerator_from_und(und, m, cur, label_col, small=small)
        if check != prev_num:
            raise RuntimeError(
                "louvain_full: contracted-graph numerator diverged from "
                f"the original graph ({prev_num} != {check}) — "
                "contraction invariant violated")
    if _capture is not None:
        _capture["final_num"] = prev_num
    return cur


def sssp(weighted_edges: DataFrame, source: int, iterations: int = 8) -> DataFrame:
    """Single-source shortest paths over weighted edges (src, dst, weight):
    Bellman-Ford rounds, d_t(v) = min(d_{t-1}(v), min over in-edges
    (d_{t-1}(u) + w)).  Fixed round count; converges when iterations >=
    longest shortest path's hop count.  Min-plus is deterministic across
    engines (each candidate is one left-associated sum chain), so results
    are oracle-matchable bit-for-bit.  Returns (id, distance)."""
    spark = weighted_edges.sparkSession
    e = weighted_edges.select("src", "dst", "weight").persist()
    try:
        dists = spark.createDataFrame([(int(source), 0.0)], "id long, distance double")
        for _ in range(iterations):
            relaxed = (
                e.join(dists.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), (F.col("distance") + F.col("weight")).alias("distance"))
            )
            dists = (
                dists.unionByName(relaxed)
                .groupBy("id")
                .agg(F.min("distance").alias("distance"))
                .localCheckpoint(eager=True)
            )
        return dists
    finally:
        e.unpersist()


def harmonic_closeness(edges: DataFrame, landmarks: list[int],
                       iterations: int = 10) -> DataFrame:
    """Landmark-approximated harmonic closeness centrality:
    h(v) = Σ over reached landmarks (distance > 0) of 1/distance — the
    standard scalable centrality estimate (exact closeness needs all-pairs
    BFS; landmark sampling is the textbook approximation, cost = one
    shortest_paths run, state |V|×|landmarks|).

    Determinism contract: the 1/d terms are summed as INTEGERS scaled by
    lcm(1..iterations) (every hop distance divides it), so the sum is
    order-independent — a raw float Σ1/d would be partition-order-dependent
    in the last bits and could flip the rounded value between engines.  One
    final division + round(6) produces the reported double.
    Returns (id, n_reached, harmonic)."""
    import math

    scale = math.lcm(*range(1, iterations + 1))
    d = shortest_paths(edges, landmarks, iterations)
    scaled = F.sum(
        F.when(F.col("distance") > 0,
               (F.lit(scale) / F.col("distance")).cast("long")))
    return d.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.round(F.coalesce(scaled, F.lit(0)) / float(scale), 6).alias("harmonic"),
    )


def diameter_double_sweep(edges: DataFrame, start_id: int | None = None,
                          iterations: int = 15) -> DataFrame:
    """Double-sweep diameter estimation over the undirected graph: BFS
    from a start vertex to its farthest reachable vertex u (ties by min
    id), then BFS from u — the second sweep's eccentricity is the classic
    tight LOWER bound on diameter (exact on trees; within a small factor
    on real graphs), at the cost of TWO landmark-BFS runs instead of the
    all-pairs computation exact diameter needs.  The two bridge scalars
    (the farthest vertex, its distance) are driver-side single-row
    lookups; everything else is the shortest_paths shuffle shape.
    Returns one row (start_id, peripheral_id, diameter_lower_bound,
    n_reached) — n_reached counts the second sweep's reach (diameter of
    THAT component)."""
    und = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))))
    if start_id is None:
        start_id = und.agg(F.min("src")).collect()[0][0]
        if start_id is None:
            raise ValueError("empty edge set")
    d1 = shortest_paths(und, [int(start_id)], iterations)
    far = (d1.agg(F.max_by(F.struct(F.col("id"), F.col("distance")),
                           F.struct(F.col("distance").alias("d"),
                                    (-F.col("id")).alias("neg")))
                  .alias("f"))
           .select("f.id", "f.distance").collect()[0])
    d2 = shortest_paths(und, [int(far["id"])], iterations)
    return (d2.agg(F.max("distance").alias("diameter_lower_bound"),
                   F.count(F.lit(1)).alias("n_reached"))
            .select(F.lit(int(start_id)).cast("long").alias("start_id"),
                    F.lit(int(far["id"])).cast("long").alias("peripheral_id"),
                    "diameter_lower_bound", "n_reached"))


def betweenness_centrality(edges: DataFrame, sources: list[int],
                           max_depth: int = 10,
                           directed: bool = False) -> DataFrame:
    """Sampled-source betweenness centrality (Brandes): for each source s
    in `sources`, a level-synchronous BFS counts shortest paths (σ), then
    the dependency accumulation δ(v) = Σ_{w∈succ(v)} σ_v/σ_w · (1+δ_w)
    runs the levels backward; betweenness(v) = Σ_s δ_s(v) over the sampled
    sources (v ≠ s).  With sources = every vertex this is exact Brandes
    (undirected graphs count each pair in both directions — halve
    externally for the classic normalization); with a sample it is the
    standard scalable estimator (scale by n/|S| for an unbiased estimate).

    Plan shape: the per-level state is keyed (source, vertex) like
    shortest_paths — state size |V|×|sources|, so keep the source sample
    small (that is the estimator's contract anyway).  Each forward level
    is one join+groupBy shuffle; each backward level joins the level's
    vertices to their predecessors and aggregates — O(depth) rounds total,
    every frame localCheckpoint'ed so lineage stays flat.  δ sums are
    float; the output is rounded to 6dp (σ ratios are exact small
    rationals, so 6dp is stable in practice, unlike raw last-bit floats).

    Returns (id, betweenness) for every vertex reached by any BFS."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.distinct().persist()
    try:
        levels: list[DataFrame] = []
        frontier = spark.createDataFrame(
            [(int(s), int(s), 1.0) for s in sources],
            "s long, v long, sigma double").localCheckpoint(eager=True)
        seen = frontier.select("s", "v")
        levels.append(frontier)
        for _ in range(max_depth):
            msgs = (frontier.join(e, frontier.v == e.src)
                    .select("s", F.col("dst").alias("v"), "sigma"))
            nxt = (msgs.groupBy("s", "v")
                   .agg(F.sum("sigma").alias("sigma"))
                   .join(seen, ["s", "v"], "left_anti")
                   .localCheckpoint(eager=True))
            if nxt.limit(1).count() == 0:
                break
            levels.append(nxt)
            seen = (seen.unionByName(nxt.select("s", "v"))
                    .localCheckpoint(eager=True))
            frontier = nxt
        # backward dependency accumulation, deepest level first
        deltas: list[DataFrame] = [None] * len(levels)
        deltas[-1] = levels[-1].select(
            "s", "v", F.lit(0.0).alias("delta"))
        for l in range(len(levels) - 1, 0, -1):
            v_lvl = (levels[l].join(deltas[l], ["s", "v"])
                     .select("s", F.col("v"),
                             F.col("sigma").alias("sigma_v"), "delta"))
            # predecessors: u -> v edge with u one level up
            contrib = (v_lvl.join(e, v_lvl.v == e.dst)
                       .select("s", F.col("src").alias("u"),
                               "sigma_v", "delta"))
            up = levels[l - 1].select(
                "s", F.col("v").alias("u"), F.col("sigma").alias("sigma_u"))
            dep = (contrib.join(up, ["s", "u"])
                   .groupBy("s", "u")
                   .agg(F.sum(F.col("sigma_u") / F.col("sigma_v")
                              * (F.lit(1.0) + F.col("delta")))
                        .alias("delta")))
            deltas[l - 1] = (up.select("s", F.col("u").alias("v"))
                             .join(dep.select("s", F.col("u").alias("v"),
                                              "delta"),
                                   ["s", "v"], "left")
                             .select("s", "v",
                                     F.coalesce("delta", F.lit(0.0))
                                     .alias("delta"))
                             .localCheckpoint(eager=True))
        out = deltas[0]
        for d in deltas[1:]:
            out = out.unionByName(d)
        return (out.filter(F.col("s") != F.col("v"))
                .groupBy(F.col("v").alias("id"))
                .agg(F.round(F.sum("delta"), 6).alias("betweenness")))
    finally:
        e.unpersist()


def random_walks(edges: DataFrame, start_ids: list[int], length: int,
                 walks_per_node: int = 1, salt: str = "") -> DataFrame:
    """Deterministic 'random' walks — the node2vec/DeepWalk input stage.
    Walk w at vertex v picks the neighbor minimizing
    md5(walk_id:step:neighbor:salt): uniform-ish among neighbors, but a
    pure function of (walk, step, neighbor), so the corpus of walks is
    reproducible across runs, engines, and partitionings — the same
    property the hash-driven samplers (functions/sampling.py) guarantee,
    and the reason the choice is a FULL md5 hex string comparison (no
    numeric truncation — any engine compares the same 32 chars).

    Returns (wid, step, vertex): step 0 is the seed; a walk reaching a
    sink (no out-edges) simply stops contributing rows.  wid enumerates
    (seed index × walks_per_node + walk index) — small ints, stable.

    Plan: per step, one join of the O(#walks) frontier against the
    adjacency (frontier broadcasts; the edge side never shuffles) and one
    tiny min_by aggregate per walk.  Step count is the iteration bound;
    lineage is cut every few steps.  At 100 TB the edge side is the by-src
    copy of the dual layout and each step stays co-located."""
    spark = edges.sparkSession
    adj = edges.select(F.col("src").alias("cur"), F.col("dst").alias("nbr")).persist()
    try:
        seeds = [(i * walks_per_node + j, int(v), 0)
                 for i, v in enumerate(start_ids) for j in range(walks_per_node)]
        frontier = spark.createDataFrame(seeds, "wid int, vertex long, step int")
        out = frontier
        for t in range(1, length + 1):
            choice = F.md5(F.concat_ws(
                ":", F.col("wid").cast("string"), F.lit(str(t)),
                F.col("nbr").cast("string"), F.lit(salt)))
            frontier = (
                F.broadcast(frontier.select("wid", F.col("vertex").alias("cur")))
                .join(adj, "cur")
                .groupBy("wid")
                .agg(F.min_by(F.col("nbr"), choice).alias("vertex"))
                .select("wid", "vertex", F.lit(t).alias("step"))
            )
            if t % 4 == 0:
                frontier = frontier.localCheckpoint(eager=True)
            out = out.unionByName(frontier)
        # materialize while the adjacency cache is alive (pagerank's rule)
        return out.select("wid", "step", "vertex").localCheckpoint(eager=True)
    finally:
        adj.unpersist()


def hyperball(edges: DataFrame, max_rounds: int = 16, lg_k: int = 12,
              rel_tol: float = 0.001,
              _rounds_out: list | None = None) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function N(r) —
    how many (v, u) pairs are within out-distance ≤ r — estimated with one
    HyperLogLog sketch per vertex instead of one BFS per vertex.  Exact
    all-pairs distances are Θ(n·m) (a BFS per vertex — years at 100 TB);
    HyperBall is O(rounds · m) with fixed 2^lg_k-byte state per vertex,
    which is why it's the only way to measure distance structure at scale.

    Per round, ball_{r+1}(v) = ball_r(v) ∪ ⋃_{(v,u)∈E} ball_r(u) — one
    join shipping neighbor sketches plus one hll_union_agg, both
    JVM-side (Spark's datasketches HLL: mergeable, fixed-size, exactly
    the combinable-aggregate shape the 100 TB plan needs; the same shuffle
    key every round, so a bucketed-by-dst edge table co-locates it).
    Stops early when N(r) grows by < rel_tol (relative) in a round — the
    1-row convergence probe follows the pagerank/CC collect contract.

    Returns (radius, reachable_pairs): N(0)=|V| through the stopping
    radius.  Estimates carry standard HLL error (~1.04/√2^lg_k ≈ 1.6% at
    the default lg_k=12); rel_tol below that is aspirational — the
    stopping rule compares successive estimates from the SAME sketches,
    whose errors are highly correlated, so in practice it still detects
    the plateau.  For exact small-graph ground truth, BFS via
    shortest_paths remains the oracle (tests do exactly that).

    No SQL oracle can replay datasketches internals, so this operator is
    pytest-covered (exact-BFS tolerance + monotonicity), like the other
    sketch/streaming surfaces."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").persist()
    try:
        verts = (e.select(F.col("src").alias("id"))
                 .unionByName(e.select(F.col("dst").alias("id")))
                 .distinct())
        state = (verts.groupBy("id")
                 .agg(F.hll_sketch_agg("id", F.lit(lg_k)).alias("ball"))
                 .localCheckpoint(eager=True))
        t0 = state.agg(F.sum(F.hll_sketch_estimate("ball")).alias("t")) \
            .collect()[0]["t"]
        if t0 is None:  # empty edge set: no vertices, no curve
            return spark.createDataFrame(
                [], "radius int, reachable_pairs double")
        totals = [float(t0)]
        rounds = 0
        for _ in range(max_rounds):
            rounds += 1
            msgs = (e.join(state.withColumnRenamed("id", "dst"), "dst")
                    .select(F.col("src").alias("id"), "ball"))
            state = (state.unionByName(msgs)
                     .groupBy("id")
                     .agg(F.hll_union_agg("ball").alias("ball"))
                     .localCheckpoint(eager=True))
            t = float(state.agg(
                F.sum(F.hll_sketch_estimate("ball")).alias("t"))
                .collect()[0]["t"])
            totals.append(t)
            if t - totals[-2] < rel_tol * totals[-2]:
                break
        if _rounds_out is not None:
            _rounds_out.append(rounds)
        return spark.createDataFrame(
            [(r, v) for r, v in enumerate(totals)],
            "radius int, reachable_pairs double")
    finally:
        e.unpersist()


def hyperball_summary(edges: DataFrame, max_rounds: int = 16,
                      lg_k: int = 12, quantile: float = 0.9) -> DataFrame:
    """One-row distance-structure summary from the HyperBall curve:
    n_vertices, avg_distance (mean over reachable pairs at distance ≥ 1),
    and the effective diameter — the smallest radius reaching `quantile`
    of all reachable pairs (interpolated between radii, the standard
    Boldi-Vigna convention)."""
    nf = sorted((r["radius"], r["reachable_pairs"])
                for r in hyperball(edges, max_rounds, lg_k).collect())
    ns = [v for _, v in nf]
    spark = edges.sparkSession
    if not ns:  # empty graph
        return spark.createDataFrame(
            [(0.0, 0.0, 0.0)],
            "n_vertices double, avg_distance double, effective_diameter double")
    n0, nmax = ns[0], ns[-1]
    gained = nmax - n0
    avg = (sum(r * (ns[r] - ns[r - 1]) for r in range(1, len(ns))) / gained
           if gained > 0 else 0.0)
    target = quantile * nmax
    eff = float(len(ns) - 1)
    for r in range(len(ns)):
        if ns[r] >= target:
            if r == 0 or ns[r] == ns[r - 1]:
                eff = float(r)
            else:
                eff = (r - 1) + (target - ns[r - 1]) / (ns[r] - ns[r - 1])
            break
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(float(n0), avg, eff)],
        "n_vertices double, avg_distance double, effective_diameter double")


def _ckpt_fresh(df: DataFrame) -> DataFrame:
    """localCheckpoint + rebuild as a bare LogicalRDD with NO inherited
    size statistics.

    localCheckpoint truncates lineage but copies the origin plan's
    size-in-bytes ESTIMATE into the LogicalRDD, so estimates compound
    across rounds; a pointer-doubling step (root ⨝ root) SQUARES the
    estimate every iteration, and after a handful of rounds the BigInt
    holding it reaches megabytes — Catalyst's stats visitor then burns
    minutes in BigInteger.divide and OOMs the driver (observed at round 3
    on a 3,638-edge graph).  Rebuilding from the already-materialized
    checkpoint RDD (JVM-side, zero recompute, no Python boundary) resets
    the estimate to defaultSizeInBytes; joins against these frames still
    end up broadcast when AQE sees the real post-shuffle sizes.

    Supported runtimes: classic py4j-backed Spark 3.4-4.x sessions ONLY.
    Uses private internals (DataFrame._jdf, QueryExecution.toRdd,
    SparkSession.internalCreateDataFrame) that do not exist on Spark
    Connect, so fail fast with a clear error instead of an opaque py4j
    AttributeError."""
    ck = df.localCheckpoint(eager=True)
    return _fresh_from_ckpt(ck, df.sparkSession)


def _fresh_from_ckpt(ck: DataFrame, spark) -> DataFrame:
    if not hasattr(ck, "_jdf"):
        raise RuntimeError(
            "_ckpt_fresh requires a classic (py4j) SparkSession; Spark "
            "Connect sessions expose no DataFrame._jdf. Run iterative "
            "graph operators on a non-Connect session.")
    jdf = ck._jdf
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False)
    return DataFrame(fresh, spark)


def _ckpt_fresh_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """`_ckpt_fresh` whose materializing action doubles as a row count
    (VERDICT r10 #4): the checkpoint is LAZY and realized by count() —
    ONE job instead of eager-checkpoint + count — then rebuilt
    stat-fresh exactly like `_ckpt_fresh`.  For loops whose guard needs
    the materialized frame's size anyway (greedy_coloring's
    broadcast-under-guard pick, spanning_forest's emptiness probe)."""
    ck = df.localCheckpoint(eager=False)
    cnt = ck.count()
    return _fresh_from_ckpt(ck, df.sparkSession), cnt


def _ckpt_fresh_probe(df: DataFrame, pred: Column) -> tuple[DataFrame, int]:
    """`_ckpt_fresh` whose materializing action doubles as a PREDICATE
    count: count(filter(pred)) over the lazy checkpoint realizes every
    partition (localCheckpoint materializes the whole RDD on its first
    job) while returning the probe the caller's fixpoint test needs —
    spanning_forest's pointer-doubling moved-count, previously a
    separate every-3rd-step job (VERDICT r10 #9)."""
    ck = df.localCheckpoint(eager=False)
    cnt = ck.filter(pred).count()
    return _fresh_from_ckpt(ck, df.sparkSession), cnt


def _edge_priority(weight: Column, u: Column, v: Column,
                   weight_scale: int = 100) -> Column:
    """Total order on weighted edges as ONE sortable string:
    zero-padded quantized weight, then u, then v.  Distinct priorities make
    the minimum spanning forest unique, so Spark and the SQL oracle agree
    bit-for-bit.  Quantization contract (the corr_pairs precedent): the
    caller guarantees weight*weight_scale is integral and non-negative —
    raw doubles in a MIN() would be fine, but tie-breaking needs the id
    suffix, and string order on a padded integer is engine-portable.

    r11: this is the ORACLE's documented form — spanning_forest itself
    now orders by `_edge_priority_struct` (same total order, 24-byte
    rows); the equivalence is pinned by
    tests/test_graph_ops.py::test_edge_priority_struct_order_equals_string_order."""
    return F.concat_ws(
        ":",
        F.lpad(F.round(weight * weight_scale).cast("long").cast("string"), 18, "0"),
        F.lpad(u.cast("string"), 12, "0"),
        F.lpad(v.cast("string"), 12, "0"),
    )


def _edge_priority_struct() -> Column:
    """The struct twin of `_edge_priority` (r11): lexicographic order on
    struct(kw, u, v) — kw the quantized non-negative weight — equals the
    zero-padded string's order exactly (decimal padding on non-negative
    longs IS numeric order), at 24 bytes a row instead of ~44.  The SQL
    oracle keeps the string form; selections agree bit-for-bit because
    the total orders are identical."""
    return F.struct("kw", "u", "v")


def spanning_forest(weighted_edges: DataFrame, max_rounds: int = 16,
                    jump_steps: int = 24,
                    weight_scale: int = 100,
                    broadcast_components: bool | None = None,
                    broadcast_max_components: int = 4_000_000) -> DataFrame:
    """Minimum spanning forest by Boruvka contraction — the MapReduce-era
    classic, O(log n) rounds, each round a pair of keyed aggregations (no
    sequential union-find, no sorting the global edge list like Kruskal).

    Round: every component picks its minimum-priority incident cross edge
    (priority = (quantized weight, u, v) — `_edge_priority_struct`, the
    24-byte struct twin of `_edge_priority`'s string whose lexicographic
    order it matches exactly; distinct by construction, so the forest
    is UNIQUE and both engines converge to the same edge set); selected
    edges join the forest; the component-pointer graph they induce (each
    component points at the neighbor its chosen edge reaches) is contracted
    by pointer doubling.  r11: the pick is ONE min_by aggregation over the
    doubled edge list (full payload rides the shuffle) — the old shape
    aggregated min(key) per component and re-joined the edge set by
    string key, a second |ed|-scale shuffle every round.  The
    per-component root table broadcasts UNDER AN EXPLICIT GUARD
    (`broadcast_components`/`broadcast_max_components=4M`, the
    greedy_coloring posture): within the guard the pointer-doubling
    self-joins and the relabel's two edge-side joins are broadcast hash
    joins — the shrinking edge set never reshuffles for relabeling —
    and past it (a 100×-scale round 1) the same plans fall back to
    shuffle joins instead of an executor-heap OOM.  With distinct priorities the pointer graph's only
    cycles are mutual pairs, whose smaller id becomes the new root — the
    textbook invariant.

    Orchestration (r8 — cuts the driver-probe constant measured at sf1):
    the live state is the RELABELED cross-edge set itself — after each
    contraction the edges are rewritten to their component endpoints,
    intra-component edges dropped, and parallel edges between the same
    component pair deduped to the minimum-priority one (safe by the cut
    property: a non-minimum edge between two components can never enter
    the forest while they are separate, and is intra once they merge).
    So the per-round joins run over a GEOMETRICALLY SHRINKING edge set,
    never the full input; the original (u, v, weight) ride along as
    payload.  r11 action budget (VERDICT r10 #9): every probe rides the
    frame's own materializing job — the edge set's emptiness check is
    the count of its lazy checkpoint (`_ckpt_fresh_counted`), and each
    pointer-doubling step's moved-count rides its checkpoint job
    (`_ckpt_fresh_probe`), so the doubling loop exits at the EXACT
    fixpoint step with zero extra jobs (previously it probed every 3rd
    step as a separate job and overshot); moved == 0 remains the
    convergence certificate.  The min-edge selection is a lazy
    checkpoint materialized by the pointer-root job that consumes it.
    Accumulators are unions of per-round checkpointed deltas, never
    re-checkpointed cumulative frames.

    Scale: per-round work is keyed aggregations over the shrinking
    cross-edge set plus log-depth pointer doubling over one row PER
    COMPONENT (not per vertex, not per edge).  A 100 TB edge set runs the
    same plan; round 1 dominates and is two shuffles of the edge set.

    Never-wrong contract (the star-CC precedent): raises RuntimeError if
    contraction or the round budget is exhausted before the fixpoint —
    partial forests are never returned.

    Returns (u, v, weight) canonical u<v, one row per forest edge."""
    spark = weighted_edges.sparkSession
    pr = _edge_priority_struct()
    ed, n_ed = _ckpt_fresh_counted(
        weighted_edges
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"), "weight")
        .groupBy("u", "v").agg(F.min("weight").alias("weight"))
        .withColumn("kw",
                    F.round(F.col("weight") * weight_scale).cast("long"))
        .select(F.col("u").alias("cu"), F.col("v").alias("cv"),
                "u", "v", "weight", "kw")
    )
    forest_legs: list[DataFrame] = []
    done = False
    prev_n_root: int | None = None
    for _ in range(max_rounds):
        if n_ed == 0:
            done = True
            break
        # each component's minimum-priority incident cross edge in ONE
        # aggregation (r11): min_by over the doubled edge list carrying
        # the full payload — the old shape aggregated (c, key) then
        # re-joined the edge set BY STRING KEY, a second |ed|-scale
        # shuffle every round; map-side partial min_by keeps one
        # candidate per component per partition
        doubled = (ed.select(F.col("cu").alias("c"),
                             "cu", "cv", "u", "v", "weight", "kw")
                   .unionByName(ed.select(F.col("cv").alias("c"),
                                          "cu", "cv", "u", "v",
                                          "weight", "kw")))
        # lazy checkpoint: the pointer-root job below consumes sel twice
        # (ptr + its reverse) and materializes it as a side effect
        sel = (doubled.groupBy("c")
               .agg(F.min_by(F.struct("cu", "cv", "u", "v", "weight"),
                             pr).alias("e"))
               .select("c", "e.cu", "e.cv", "e.u", "e.v", "e.weight")
               .localCheckpoint(eager=False))
        forest_legs.append(sel.select("u", "v", "weight").distinct())
        # component pointer graph: c -> the other endpoint's component
        ptr = sel.select(
            "c",
            F.when(F.col("cu") == F.col("c"), F.col("cv"))
             .otherwise(F.col("cu")).alias("p"))
        # break mutual pairs: the smaller id of a 2-cycle roots itself.
        # r11 (guide §3.1): both sides are COMPONENT-scale, but sel is a
        # lazy checkpoint carrying default stats, so this left join
        # planned SortMergeJoin every round (the one residual SMJ in the
        # captured round plans).  The exact n_root isn't known yet (it
        # rides this join's own count), so the guard bound is the
        # PREVIOUS round's n_root — components only shrink — with
        # 2·n_ed as the sound round-1 fallback (every live component
        # has ≥1 incident cross edge); past the guard the SMJ stands.
        pair_bound = prev_n_root if prev_n_root is not None else 2 * n_ed
        bcast_pair = (pair_bound <= broadcast_max_components
                      if broadcast_components is None
                      else broadcast_components)
        other = ptr.select(F.col("c").alias("p"), F.col("p").alias("back"))
        if bcast_pair:
            other = F.broadcast(other)
        root, n_root = _ckpt_fresh_counted(
            ptr.join(other, "p", "left")
            .select(
                "c",
                F.when((F.col("back") == F.col("c")) & (F.col("c") < F.col("p")),
                       F.col("c")).otherwise(F.col("p")).alias("p"))
        )
        prev_n_root = n_root
        # broadcast-under-guard (greedy_coloring's posture, r11): root is
        # one row PER COMPONENT — 16 bytes a row, so up to the guard it
        # ships to every task and the doubling/relabel joins stop
        # shuffling the (much larger) edge set; past the guard (a
        # 100×-scale first round) the shuffle plans below run unchanged.
        # n_root rides the root job's own count (_ckpt_fresh_counted).
        bcast = (n_root <= broadcast_max_components
                 if broadcast_components is None else broadcast_components)

        def _b(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if bcast else df

        converged = False
        for s in range(1, jump_steps + 1):
            hop = _b(root.select(F.col("c").alias("p"),
                                 F.col("p").alias("pp")))
            # the moved-count probe rides the step's own materializing
            # job (r11) — exact exit at the fixpoint step, no extra jobs
            stepped, moved = _ckpt_fresh_probe(
                root.join(hop, "p", "left")
                .select("c", F.coalesce("pp", "p").alias("p"),
                        (F.col("pp") != F.col("p")).alias("moved")),
                F.col("moved"))
            root = stepped.select("c", "p")
            if moved == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                "spanning_forest: pointer doubling did not reach the roots "
                f"within {jump_steps} steps — raise jump_steps")
        # relabel endpoints to roots, drop intra edges, dedupe each
        # component pair to its minimum-priority edge (cut property)
        ru = _b(root.select(F.col("c").alias("cu"), F.col("p").alias("ncu")))
        rv = _b(root.select(F.col("c").alias("cv"), F.col("p").alias("ncv")))
        relab = (
            ed.join(ru, "cu", "left").join(rv, "cv", "left")
            .select(F.coalesce("ncu", "cu").alias("a"),
                    F.coalesce("ncv", "cv").alias("b"),
                    "u", "v", "weight", "kw")
            .filter(F.col("a") != F.col("b"))
        )
        ed, n_ed = _ckpt_fresh_counted(
            relab
            .groupBy(F.least("a", "b").alias("cu"),
                     F.greatest("a", "b").alias("cv"))
            .agg(F.min_by(F.struct("u", "v", "weight", "kw"),
                          pr).alias("e"))
            .select("cu", "cv", "e.u", "e.v", "e.weight", "e.kw")
        )
    if not done and n_ed != 0:
        raise RuntimeError(
            f"spanning_forest: not converged in {max_rounds} rounds")
    forest = spark.createDataFrame([], "u long, v long, weight double")
    for leg in forest_legs:
        forest = forest.unionByName(leg)
    return forest


def maximal_independent_set(edges: DataFrame,
                            max_rounds: int = 24,
                            broadcast_max_vertices: int = 4_000_000) -> DataFrame:
    """Maximal independent set by Luby's algorithm with DETERMINISTIC
    md5 priorities — the distributed-greedy workhorse behind scheduling,
    coloring seeds, and landmark selection.

    Round t: an active vertex joins the MIS iff its priority is strictly
    below every active neighbor's (priority = md5(id) || ':' || padded id —
    portable, collision-free via the id suffix); selected vertices and
    their neighbors leave the active set.  With random-like priorities the
    active edge set shrinks by a constant factor per round in expectation
    (Luby's lemma), so O(log n) rounds — each round two keyed aggregations
    over the ACTIVE subgraph only, which collapses geometrically.

    Orchestration (r8): the MIS accumulator is a union of per-round
    checkpointed DELTAS (each round's sel), never a re-checkpointed
    cumulative frame — the growing O(|mis|) rewrite per round is gone.
    `sel` itself stays eagerly checkpointed: the adj⋈sel neighbor-drop
    join needs sel's REAL size (a filter derived from a _ckpt_fresh frame
    would carry defaultSizeInBytes and silently lose the broadcast,
    turning the drop join into a full adjacency shuffle — measured 1.5×
    regression at sf1).

    Never-wrong contract: raises RuntimeError if the active set is not
    empty after max_rounds — a prefix of an MIS is not an MIS.

    Returns (id, round) — round = 1-based selection round (deterministic,
    value-checkable)."""
    und = _undirected_simple(edges)
    adj = _ckpt_fresh(
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
    )
    prio = F.concat_ws(
        ":", F.md5(F.col("id").cast("string")),
        F.lpad(F.col("id").cast("string"), 12, "0"))
    # r11 (guide §1.2 action budget): the active set's row count rides its
    # own checkpoint-materializing job (_ckpt_fresh_counted), so the
    # per-round emptiness test is a driver-side integer compare instead of
    # a separate isEmpty() action — one fewer job per round.
    active, n_act = _ckpt_fresh_counted(
        adj.select(F.col("a").alias("id")).distinct()
        .withColumn("prio", prio)
    )
    spark = edges.sparkSession
    mis_legs: list[DataFrame] = []
    done = False
    for t in range(1, max_rounds + 1):
        if n_act == 0:
            done = True
            break
        # r11 (guide §3.1): `active`/`sel`/`dropped` are vertex-scale and
        # their exact size (n_act) rides the round's own checkpoint count,
        # so the broadcast decision costs no extra action; _ckpt_fresh
        # frames carry default (huge) stats, so without the explicit hint
        # every one of these joins shuffled the EDGE-scale adjacency
        # (SortMergeJoin in the captured round plans).  Past the guard the
        # shuffle plan stays.
        # r12 (ADVICE r11, guide §2.3 "keys, not payloads"): the row-count
        # guard ignored row WIDTH — the ~45-char prio string made a
        # 4M-row broadcast ~250MB+.  Fixes: (a) the b-side broadcast now
        # carries BARE ids and prio_b is recomputed probe-side (prio is a
        # pure function of the id — identical strings, codegen'd md5 per
        # probe row instead of 6× the broadcast bytes); (b) frames that
        # still carry a prio-width string (min_nb's mn) broadcast under a
        # HALVED guard (_bw) sized for their ~4× wider rows.
        def _b(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if n_act <= broadcast_max_vertices else df

        def _bw(df: DataFrame) -> DataFrame:
            return (F.broadcast(df)
                    if n_act <= broadcast_max_vertices // 2 else df)

        prio_b = F.concat_ws(
            ":", F.md5(F.col("b").cast("string")),
            F.lpad(F.col("b").cast("string"), 12, "0"))
        act_nb = (
            adj.join(_b(active.select(F.col("id").alias("a"))), "a")
            .join(_b(active.select(F.col("id").alias("b"))), "b")
            .withColumn("prio_b", prio_b)
        )
        min_nb = act_nb.groupBy("a").agg(F.min("prio_b").alias("mn"))
        sel = _ckpt_fresh(
            active.join(_bw(min_nb.withColumnRenamed("a", "id")), "id", "left")
            .filter(F.col("mn").isNull() | (F.col("prio") < F.col("mn")))
            .select("id")
        )
        mis_legs.append(sel.select("id", F.lit(t).alias("round")))
        dropped = sel.unionByName(
            adj.join(_b(sel.withColumnRenamed("id", "a")), "a")
            .select(F.col("b").alias("id"))).distinct()
        active, n_act = _ckpt_fresh_counted(
            active.join(_b(dropped), "id", "left_anti"))
    if not done and n_act != 0:
        raise RuntimeError(
            f"maximal_independent_set: active set nonempty after "
            f"{max_rounds} rounds")
    mis = spark.createDataFrame([], "id long, round int")
    for leg in mis_legs:
        mis = mis.unionByName(leg)
    return mis


def greedy_coloring(edges: DataFrame, max_rounds: int = 40,
                    broadcast_picks: bool | None = None,
                    broadcast_max_picks: int = 4_000_000,
                    _plan_out: list | None = None) -> DataFrame:
    """Jones-Plassmann greedy graph coloring with deterministic md5
    priorities — register allocation, schedule slotting, conflict-free
    batching.  A vertex colors itself in the round where no SMALLER-
    priority neighbor is still uncolored, taking the smallest color absent
    among its already-colored neighbors; adjacent vertices can never color
    in the same round (one of them has the smaller priority), so the
    coloring is proper by construction and uses ≤ maxdegree+1 colors.

    The "smallest missing color" (mex) is computed WITHOUT a candidate
    explosion: collect_set of the DISTINCT neighbor colors per frontier
    vertex (set size ≤ colors assigned so far, never O(neighbors)), then
    the least value of sequence(0, size(used)) absent from the set —
    pigeonhole guarantees the mex lies in that range, so a hub with 10⁸
    colored neighbors still aggregates to one small array row.

    Rounds = the longest strictly-decreasing-priority path, O(log n) with
    high probability on random-like (md5) priorities.  Never-wrong
    contract: raises if uncolored vertices remain after max_rounds.

    Orchestration (r9 — the 6.7×-cc_star sf1 constant cut to ~2.2×,
    210s → 69s on the sf1 probe graph; fourth design this round, the
    first three measured and rejected at sf1):

    * ONE STATE FRAME holds everything: a row per directed adjacency
      pair of a STILL-UNCOLORED vertex `a`, carrying either the
      neighbor's priority (neighbor uncolored) or its color (neighbor
      colored; prio_b nulled).  One exchange-free aggregation per round
      computes BOTH the frontier condition (min uncolored-neighbor
      priority) and the mex input (distinct neighbor colors); one
      rewrite per round removes picked vertices' rows and converts
      their neighbors' rows to color rows.  Two eager jobs per round,
      and the rewrite's count doubles as an EXACT termination probe.
    * Exchange-free: the state is hash-partitioned on `a` once and kept
      partitioned through a PERSIST chain (broadcast joins and
      projections preserve partitioning, so the per-round groupBy has
      no Exchange — localCheckpoint would drop partitioning at the
      Catalyst level and reshuffle ~m wide rows every round, measured
      5-10s/round at sf1).  Every 8th round the state is
      repartition + localCheckpoint'ed instead: persist does NOT cut
      lineage, and an unbounded plan chain blows up tree
      stringification (measured); the periodic checkpoint bounds plan
      depth at the cost of one amortized shuffle of the SHRINKING
      state.
    * The state shrinks geometrically (rows leave when their vertex
      colors), so late rounds are ~0.3s; priorities are stored only for
      uncolored neighbors and `a`'s own priority is recomputed from the
      group key post-aggregation (group-sized, not edge-sized).

    Never-wrong contract unchanged: raises if state rows remain after
    max_rounds.  The smallest-missing-color (mex) has no candidate
    explosion: `used` holds DISTINCT neighbor colors (≤ colors assigned
    so far, never O(neighbors)), and the least value of
    sequence(0, size(used)) absent from the set is the mex by
    pigeonhole — a hub with 10⁸ colored neighbors still aggregates to
    one small array row.

    The per-round pick joins (anti-join on `a`, color-join on `b`) are
    broadcast UNDER AN EXPLICIT GUARD (pagerank's posture, not AQE
    luck): broadcast_picks=None auto-decides per round from the pick's
    materialized row count — under broadcast_max_picks the frontier
    ships to every task and the state's hash-partitioning on `a`
    survives both joins, keeping the next round's groupBy Exchange-free.
    Past the guard (an early Jones-Plassmann round on a 100×-scale
    graph can color a large vertex fraction at once — a pick too big for
    any executor heap) the round falls back to shuffle joins: the
    b-join reshuffles the SHRINKING state and the round explicitly
    repartitions its result back on `a` before persisting, so one
    oversized round costs one state-sized exchange instead of an OOM —
    and later rounds return to the Exchange-free path.  The default
    threshold (4M rows ≈ tens of MB of (id, color) pairs) is sized like
    pagerank's broadcast_max_vertices — executor-heap territory, not
    "whatever a big cluster fits"; raise it explicitly on beefier
    deployments.  `_plan_out`, when a list, receives the round-2
    aggregation's executed-plan string (test hook pinning the
    Exchange-free claim).

    Returns (id, color), color ∈ {0, 1, ...} dense from 0."""
    und = _undirected_simple(edges)

    def _prio(c: Column) -> Column:
        return F.concat_ws(":", F.md5(c.cast("string")),
                           F.lpad(c.cast("string"), 12, "0"))

    both = (und.select(F.col("u").alias("a"), F.col("v").alias("b"))
            .unionByName(und.select(F.col("v").alias("a"),
                                    F.col("u").alias("b"))))
    state = (both.repartition("a")
             .withColumn("prio_b", _prio(F.col("b")))
             .withColumn("color", F.lit(None).cast("int"))).persist()
    n_rows = state.count()
    spark = edges.sparkSession
    colored_legs: list[DataFrame] = []
    prev = state
    try:
        for t in range(1, max_rounds + 1):
            if n_rows == 0:
                break
            agg = (state.groupBy("a")
                   .agg(F.min("prio_b").alias("mn"),
                        F.collect_set("color").alias("used")))
            if _plan_out is not None and t == 2:
                _plan_out.append(
                    agg._jdf.queryExecution().executedPlan().toString())
            pick, n_pick = _ckpt_fresh_counted(
                agg.filter(F.col("mn").isNull()
                           | (_prio(F.col("a")) < F.col("mn")))
                .select(F.col("a").alias("id"), F.expr(
                    "CAST(array_min(filter(sequence(0, size(used)), "
                    "c -> NOT array_contains(used, c))) AS INT)")
                    .alias("color")))
            colored_legs.append(pick)
            # explicit broadcast-under-guard: the guard count rode the
            # pick's own materializing job (r11 — one action, not two)
            bcast = (n_pick <= broadcast_max_picks
                     if broadcast_picks is None else broadcast_picks)
            pick_a = pick.select(F.col("id").alias("a"))
            pick_b = pick.select(F.col("id").alias("b"),
                                 F.col("color").alias("nc"))
            if bcast:
                pick_a, pick_b = F.broadcast(pick_a), F.broadcast(pick_b)
            nstate = (
                state.join(pick_a, "a", "left_anti")
                .join(pick_b, "b", "left")
                .select("a", "b",
                        F.when(F.col("nc").isNotNull(),
                               F.lit(None).cast("string"))
                        .otherwise(F.col("prio_b")).alias("prio_b"),
                        F.coalesce("nc", "color").alias("color")))
            if t % 8 == 0:
                nstate = nstate.repartition("a").localCheckpoint(eager=True)
            elif bcast:
                nstate = nstate.persist()
            else:
                # shuffle fallback: the b-join dropped `a`-partitioning;
                # re-establish it NOW so only this round pays the exchange
                nstate = nstate.repartition("a").persist()
            n_rows = nstate.count()
            prev.unpersist(True)
            prev = state = nstate
        if n_rows != 0:
            raise RuntimeError(
                f"greedy_coloring: uncolored vertices after "
                f"{max_rounds} rounds")
    finally:
        prev.unpersist(True)
    out = spark.createDataFrame([], "id long, color int")
    for leg in colored_legs:
        out = out.unionByName(leg)
    return out


def node2vec_walks(edges: DataFrame, start_ids: list[int], length: int,
                   p: float = 1.0, q: float = 2.0,
                   walks_per_node: int = 1, salt: str = "") -> DataFrame:
    """Second-order biased walks (Grover & Leskovec 2016, node2vec) — the
    return/in-out-tunable generalization of `random_walks`: the step from
    cur (having arrived from prev) weighs candidate nbr by α = 1/p if
    nbr == prev (return), 1 if nbr is adjacent to prev (BFS-ish), 1/q
    otherwise (DFS-ish).

    Deterministic weighted choice, engine-exact: candidate priority =
    md5_48(wid:step:nbr:salt) DIV round(10⁶·α) — a larger α divides the
    hash rank harder and wins more often, and both engines compute the
    same integer quotient (never a float division: a double quotient of
    two big ints can round across the truncation boundary).  Ties break
    on the neighbor id inside the padded priority string.  Step 1 has no
    prev and falls back to the uniform md5 choice — exactly
    `random_walks`' first step.

    Plan per step: the O(#walks) frontier broadcasts against the
    adjacency (edge side never shuffles); the distance-1 bias test joins
    the candidates against the O(edges) undirected pair set keyed
    (prev, nbr) — that flag table is NEVER broadcast (it is edge-sized);
    it is repartition-persisted on the join key once, so each step's
    flag join shuffles only the tiny candidate side and reuses the
    cached partitioning.  Broadcast is used only for the frontier side.

    Returns (wid, step, vertex), step 0 = seed."""
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be positive, got p={p} q={q}")
    ret_w = round(1_000_000 / p)
    far_w = round(1_000_000 / q)
    if ret_w < 1 or far_w < 1:
        # round(1e6/x) == 0 would make the DIV divisor NULL-producing /
        # zero; the quantized-alpha contract only holds for p, q <= 2e6.
        raise ValueError(
            f"p and q must be <= 2e6 so round(1e6/p|q) >= 1, got p={p} q={q}")
    spark = edges.sparkSession
    adj = edges.select(F.col("src").alias("cur"), F.col("dst").alias("nbr")).persist()
    # the distance-1 flag table is O(edges) — NEVER broadcast it; cache it
    # pre-partitioned on the join key so each step's flag join shuffles
    # only the tiny candidate side (the cached partitioning is reused)
    undp = (
        edges.select(F.col("src").alias("pa"), F.col("dst").alias("pb"))
        .unionByName(edges.select(F.col("dst").alias("pa"), F.col("src").alias("pb")))
        .distinct().withColumn("is_near", F.lit(1))
        .repartition("pa", "pb").persist()
    )
    try:
        seeds = [(i * walks_per_node + j, int(v), 0)
                 for i, v in enumerate(start_ids) for j in range(walks_per_node)]
        frontier = spark.createDataFrame(seeds, "wid int, vertex long, step int") \
            .withColumn("prev", F.lit(None).cast("long"))
        out = frontier.select("wid", "step", "vertex")
        for t in range(1, length + 1):
            h = F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.col("wid").cast("string"), F.lit(str(t)),
                F.col("nbr").cast("string"), F.lit(salt))), 1, 12), 16, 10) \
                .cast("long")
            alpha = (
                F.when(F.col("nbr") == F.col("prev"), F.lit(ret_w))
                .when(F.col("is_near") == 1, F.lit(1_000_000))
                .otherwise(F.lit(far_w)))
            # step 1 (prev NULL): uniform — divisor 1e6 for every candidate
            alpha = F.when(F.col("prev").isNull(), F.lit(1_000_000)) \
                .otherwise(alpha)
            prio = F.concat_ws(
                ":",
                F.lpad(F.expr("_h DIV _a").cast("string"), 15, "0"),
                F.lpad(F.col("nbr").cast("string"), 12, "0"))
            cand = (
                F.broadcast(frontier.select(
                    "wid", F.col("vertex").alias("cur"), "prev"))
                .join(adj, "cur")
                .join(undp,
                      (F.col("prev") == F.col("pa"))
                      & (F.col("nbr") == F.col("pb")), "left")
                .withColumn("_h", h)
                .withColumn("_a", alpha)
            )
            cand = cand.withColumn("_prio", prio)
            frontier = (
                cand.groupBy("wid")
                .agg(F.min_by(F.col("nbr"), F.col("_prio")).alias("vertex"),
                     F.min("cur").alias("prev"))
                .select("wid", "vertex", F.lit(t).alias("step"), "prev")
            )
            if t % 4 == 0:
                frontier = frontier.localCheckpoint(eager=True)
            out = out.unionByName(frontier.select("wid", "step", "vertex"))
        return out.localCheckpoint(eager=True)
    finally:
        adj.unpersist()
        undp.unpersist()
