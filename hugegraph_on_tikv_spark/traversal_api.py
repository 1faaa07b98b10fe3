"""Fluent property-graph traversal API (Gremlin-flavored).

The reference is mounted under HugeGraph, whose user-facing query surface is
Gremlin: `g.V().hasLabel('person').has('age', gt(29)).out('knows').count()`.
Traversal steps are compiled upstream into the backend scans this engine
already implements (SURVEY.md §3.1).  This module gives users of that
surface a direct equivalent — each step composes onto the DataFrame plan,
so an entire traversal compiles to ONE Catalyst-optimized query (filters
push into the vertex/edge scans; hops become joins; `count()` is the only
action).

Gremlin semantics preserved where they matter:
* traversers carry multiplicity — `out()` emits one traverser per edge, no
  implicit dedup (call `.dedup()` for distinct);
* `has` accepts a value (equality) or a predicate tuple like (">=", 10),
  mirroring Gremlin's P.gte etc.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.graph import GraphStore

_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "in": lambda c, v: c.isin(list(v)),
    "prefix": lambda c, v: c.startswith(str(v)),
}


class Traversal:
    """A lazy traversal: `df` holds the current traversers.  Vertex-position
    traversals carry a single `id` column (plus any `as_`-selected columns
    later); edge-position traversals carry the edge schema."""

    def __init__(self, graph: "Graph", df: DataFrame, position: str):
        self._g = graph
        self._df = df
        self._pos = position  # 'V' | 'E'

    # -- filters -----------------------------------------------------------
    def has_label(self, *labels: str) -> "Traversal":
        if self._pos == "V":
            v = self._g.vertices.filter(F.col("label").isin(list(labels))).select("id")
            return Traversal(self._g, self._df.join(v, "id"), "V")
        return Traversal(self._g, self._df.filter(F.col("label").isin(list(labels))), "E")

    def has(self, prop: str, value: Any) -> "Traversal":
        op, v = value if isinstance(value, tuple) else ("=", value)
        pred = _OPS[op](F.col(prop), v)
        if self._pos == "V":
            keep = self._g.vertices.filter(pred).select("id")
            return Traversal(self._g, self._df.join(keep, "id"), "V")
        return Traversal(self._g, self._df.filter(pred), "E")

    def has_id(self, *ids: int) -> "Traversal":
        return Traversal(self._g, self._df.filter(F.col("id").isin(list(ids))), self._pos)

    # -- hops --------------------------------------------------------------
    def _edges(self, labels: Sequence[str], order_by: str = "src"):
        # direction-appropriate physical copy (the reference's out/in twin
        # adjacency tables become two partition layouts of one logical table)
        e = self._g.edges if order_by == "src" else self._g.edges_by_dst
        return e.filter(F.col("label").isin(list(labels))) if labels else e

    def _carried(self) -> list[str]:
        """Columns that ride along with the traverser through hops: as_()
        labels, the path history, and the sack accumulator."""
        return [c for c in self._df.columns
                if c.startswith("_as_") or c in ("_path", "_sack")]

    def _hop(self, edge_df: DataFrame, new_id: str) -> DataFrame:
        """One hop: join current traversers (id) to edge_df on `id`, the new
        position is edge_df[new_id].  Carried columns survive; the path
        history appends the new position."""
        carried = self._carried()
        out = (
            self._df.select("id", *carried).join(edge_df, "id")
            .select(F.col(new_id).alias("id"), *carried)
        )
        if "_path" in carried:
            out = out.withColumn("_path", F.concat(F.col("_path"), F.array(F.col("id"))))
        return out

    def out(self, *labels: str) -> "Traversal":
        e = self._edges(labels).select(F.col("src").alias("id"), F.col("dst"))
        return Traversal(self._g, self._hop(e, "dst"), "V")

    def in_(self, *labels: str) -> "Traversal":
        e = self._edges(labels, "dst").select(F.col("dst").alias("id"), F.col("src"))
        return Traversal(self._g, self._hop(e, "src"), "V")

    def both(self, *labels: str) -> "Traversal":
        # each direction reads its direction-matching physical copy, so on a
        # layout-backed store BOTH branches arrive distributed on the hop key
        fwd = self._edges(labels).select(
            F.col("src").alias("id"), F.col("dst").alias("nbr"))
        bwd = self._edges(labels, "dst").select(
            F.col("dst").alias("id"), F.col("src").alias("nbr"))
        adj = fwd.unionByName(bwd)
        return Traversal(self._g, self._hop(adj, "nbr"), "V")

    def out_e(self, *labels: str) -> "Traversal":
        """Vertex → out-edges.  as_() labels and path history ride along on
        the edge frame, so as_('a').out_e(...).in_v().select('a') works.
        Without carried columns, duplicate traversers at one vertex are
        collapsed before the edge join (the published multiplicity)."""
        e = self._edges(labels)
        carried = self._carried()
        left = self._df.select(F.col("id").alias("src"), *carried)
        if not carried:
            left = left.distinct()
        return Traversal(self._g, e.join(left, "src"), "E")

    def in_e(self, *labels: str) -> "Traversal":
        e = self._edges(labels, "dst")
        carried = self._carried()
        left = self._df.select(F.col("id").alias("dst"), *carried)
        if not carried:
            left = left.distinct()
        return Traversal(self._g, e.join(left, "dst"), "E")

    def _edge_to_vertex(self, endpoint: str) -> DataFrame:
        carried = self._carried()
        out = self._df.select(F.col(endpoint).alias("id"), *carried)
        if "_path" in carried:
            out = out.withColumn("_path", F.concat(F.col("_path"), F.array(F.col("id"))))
        return out

    def out_v(self) -> "Traversal":
        """Edge → source vertex (multiplicity preserved; carried labels and
        path history survive, the path appends the vertex)."""
        return Traversal(self._g, self._edge_to_vertex("src"), "V")

    def in_v(self) -> "Traversal":
        return Traversal(self._g, self._edge_to_vertex("dst"), "V")

    def repeat(self, step, times: int, emit: bool = False,
               emit_first: bool = False) -> "Traversal":
        """Gremlin repeat(...).times(n): apply a traversal-to-traversal
        function n times (e.g. `t.repeat(lambda t: t.out('knows'), 3)`).
        For hop-steps this composes n joins into one plan — deep repeats
        should checkpoint via .barrier() every few rounds.

        `emit=True` is Gremlin's repeat(X).emit().times(n): the result is
        the bag-union of every intermediate frontier (after each of the n
        applications), multiplicity preserved — the k-hop *neighborhood*
        instead of the k-th frontier.  `emit_first=True` additionally emits
        the incoming traversers (Gremlin's emit() placed BEFORE repeat()).
        Each emitted frontier is one branch of a unionByName, so the whole
        emission is still a single Catalyst plan; the branches share the
        hop-prefix subplans and the union itself is a zero-shuffle bag
        merge.  Deep emitting repeats should .barrier() inside the step so
        branch k doesn't re-execute hops 1..k-1 from scratch."""
        t = self
        frames = [self._df] if (emit and emit_first) else []
        for _ in range(times):
            t = step(t)
            if emit:
                if t._pos != self._pos or sorted(t._df.columns) != sorted(self._df.columns):
                    raise ValueError(
                        "repeat(emit=True) requires the step to preserve "
                        "position and carried columns")
                frames.append(t._df)
        if not emit:
            return t
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        return Traversal(self._g, df, self._pos)

    def match_(self, *clauses) -> "Traversal":
        """Gremlin match()-lite: conjunctive pattern matching.  Each clause
        is `(from_label, step_fn, to_label)` — the sub-traversal binds
        `to_label` for every element reachable from a `from_label` binding,
        e.g.::

            g.V().has_label('customer').match_(
                ('a', lambda t: t.out('placed'),     'b'),
                ('b', lambda t: t.out('contains'),   'c'),
                ('a', lambda t: t.out('located_in'), 'n'),
            ).select('a', 'c', 'n')

        Compilation: the incoming traversers seed the first clause's
        from-label; each clause is evaluated ONCE from the DISTINCT
        currently-bound vertices of its from-label (same per-distinct-vertex
        discipline as coalesce_/not_) and produces a (from, to) binding
        table; binding tables join on their shared labels.  A clause whose
        to-label is already bound joins on BOTH columns — a cyclic/equality
        constraint.  The result is one row per satisfying assignment
        (pattern-match semantics; incoming traverser multiplicity at a
        vertex multiplies its assignments, like Gremlin), with every label
        retrievable via select().  Clauses may be written in ANY order —
        a forward-chaining solver-lite pass reorders them so each
        from-label is bound before use (the first clause's from-label is
        seeded by the incoming traversers); a pattern where some
        from-label is never bindable is rejected.  The whole pattern stays
        one Catalyst plan: clause joins are plain equi-joins Catalyst can
        reorder/broadcast."""
        if self._pos != "V":
            raise ValueError("match_() is supported at vertex positions")
        if self._carried():
            raise ValueError("match_() after as_()/with_path() is not "
                             "supported; apply labels after it")
        if not clauses:
            raise ValueError("match_() needs at least one clause")
        # solver-lite clause ordering (forward chaining): repeatedly take
        # the first pending clause whose from-label is already bound — the
        # caller may write clauses in any order; a pattern with no such
        # ordering (a from-label nothing ever binds) is rejected
        first_from = clauses[0][0]
        reachable = {first_from}
        pending = list(clauses)
        ordered = []
        while pending:
            pick = next((c for c in pending if c[0] in reachable), None)
            if pick is None:
                unbound = sorted({c[0] for c in pending})
                raise ValueError(
                    f"clause from-label(s) {unbound} are not bound by any "
                    f"ordering of the clauses — every from-label must be "
                    f"reachable from {first_from!r} via earlier to-labels")
            pending.remove(pick)
            ordered.append(pick)
            reachable.add(pick[2])
        result = self._df.select(F.col("id").alias(first_from))
        bound = {first_from}
        for frm, fn, to in ordered:
            start = result.select(F.col(frm).alias("id")).distinct()
            probe = Traversal(
                self._g, start.withColumn("_as___origin", F.col("id")), "V")
            out = fn(probe)
            if out._pos != "V":
                raise ValueError("match_() clauses must end at vertices")
            binding = out._df.select(F.col("_as___origin").alias(frm),
                                     F.col("id").alias(to))
            if to in bound:
                result = result.join(binding, [frm, to])
            else:
                result = result.join(binding, frm)
                bound.add(to)
        labeled = [F.col(b).alias(f"_as_{b}") for b in sorted(bound)]
        df = result.select(F.col(first_from).alias("id"), *labeled)
        return Traversal(self._g, df, "V")

    def barrier(self) -> "Traversal":
        """Materialization barrier (localCheckpoint): cuts lineage inside
        long repeat() chains — the engine-side analog of Gremlin's barrier
        step."""
        return Traversal(self._g, self._df.localCheckpoint(eager=True), self._pos)

    # -- labels / paths ----------------------------------------------------
    def as_(self, name: str) -> "Traversal":
        """Gremlin as(name): label the current position; the labeled id rides
        along through subsequent hops and is retrieved with select()."""
        if self._pos != "V":
            raise ValueError("as_() is supported at vertex positions")
        return Traversal(self._g, self._df.withColumn(f"_as_{name}", F.col("id")), "V")

    def select(self, *names: str) -> DataFrame:
        """Gremlin select(a, b, ...): one column per as_() label, one row per
        surviving traverser (multiplicity preserved)."""
        missing = [n for n in names if f"_as_{n}" not in self._df.columns]
        if missing:
            raise ValueError(f"unknown as_() labels: {missing}")
        return self._df.select(*[F.col(f"_as_{n}").alias(n) for n in names])

    def value_map(self, *props: str) -> DataFrame:
        """Gremlin valueMap(): one row per surviving traverser, one column
        per requested property (ALL element properties when none are
        named), plus the id at vertex positions.  Relational translation of
        Gremlin's per-element map: a property the element lacks comes back
        NULL (Gremlin omits the key; a column can't vanish per-row).
        Multiplicity preserved — the property join is on the already-
        filtered traverser set, so property columns never scan wider than
        the traversal."""
        if self._pos == "V":
            vs = self._g.vertices
            cols = list(props) or [c for c in vs.columns if c != "id"]
            missing = [p for p in cols if p not in vs.columns]
            if missing:
                raise ValueError(f"unknown vertex properties: {missing}")
            return self._df.select("id").join(
                vs.select("id", *cols), "id", "left")
        data_cols = [c for c in self._df.columns
                     if not c.startswith("_as_")
                     and c not in ("_path", "_sack")]
        cols = list(props) or data_cols
        missing = [p for p in cols if p not in self._df.columns]
        if missing:
            raise ValueError(f"unknown edge properties: {missing}")
        return self._df.select(*cols)

    def project_(self, **selectors) -> DataFrame:
        """Gremlin project('a','b').by(...).by(...): one output column per
        keyword, one row per traverser.  Selector forms:

        * ``"id"`` — the current vertex id;
        * a property name — joined from the vertex table;
        * a 1-arg callable (sub-traversal step) — the per-traverser RESULT
          COUNT of running it from this position (the ``by(out().count())``
          idiom; counts are the one fold every Gremlin projection uses that
          needs real per-traverser grouping).

        The traverser set is checkpointed and keyed once
        (monotonically_increasing_id is only stable on a materialized
        frame); each callable selector runs as its own branch carrying the
        row key, grouped and joined back — N sub-traversals = N branch
        plans, never a per-row loop."""
        if self._pos != "V":
            raise ValueError("project_() is supported at vertex positions")
        base = (self._df.localCheckpoint(eager=True)
                .withColumn("_proj_row", F.monotonically_increasing_id())
                .localCheckpoint(eager=True))
        vs = self._g.vertices
        out = base
        for name, sel in selectors.items():
            if callable(sel):
                seed = Traversal(
                    self._g,
                    base.select("id",
                                F.col("_proj_row").alias("_as__proj")),
                    "V")
                res = sel(seed)._df
                counts = (res.groupBy(F.col("_as__proj").alias("_proj_row"))
                          .agg(F.count(F.lit(1)).alias(name)))
                out = out.join(counts, "_proj_row", "left") \
                    .withColumn(name, F.coalesce(name, F.lit(0)))
            elif sel == "id":
                out = out.withColumn(name, F.col("id"))
            elif isinstance(sel, str):
                if sel not in vs.columns:
                    raise ValueError(f"unknown vertex property: {sel}")
                out = out.join(
                    vs.select("id", F.col(sel).alias(name)), "id", "left")
            else:
                raise ValueError(
                    f"selector for {name!r} must be 'id', a property name "
                    f"or a callable step")
        return out.select("id", *selectors.keys())

    def choose_(self, condition, true_step, false_step=None) -> "Traversal":
        """Gremlin choose(pred, a, b): route every traverser through
        exactly one branch.  `condition` is (prop, value) or
        (prop, op, value) evaluated on the CURRENT vertex (same operator
        grammar as has()); the steps are 1-arg callables
        Traversal → Traversal; false_step None means identity.  The two
        branch frames are unioned by name (a carried column only one
        branch added comes back NULL on the other — same convention as
        optional()); both branches must land on the same position."""
        if self._pos != "V":
            raise ValueError("choose_() is supported at vertex positions")
        if len(condition) == 2:
            prop, op, value = condition[0], "=", condition[1]
        else:
            prop, op, value = condition
        pred = _OPS[op](F.col(prop), value)
        keep = self._g.vertices.filter(pred).select("id")
        t_true = true_step(Traversal(self._g, self._df.join(keep, "id"), "V"))
        f_seed = Traversal(self._g,
                           self._df.join(keep, "id", "left_anti"), "V")
        t_false = false_step(f_seed) if false_step is not None else f_seed
        if t_true._pos != t_false._pos:
            raise ValueError("choose_() branches must end on the same "
                             "position (both V or both E)")
        return Traversal(
            self._g,
            t_true._df.unionByName(t_false._df, allowMissingColumns=True),
            t_true._pos)

    def with_path(self) -> "Traversal":
        """Enable Gremlin path() tracking from this position on: each hop
        appends the new vertex id to a per-traverser history array.  Opt-in
        because the history column grows with hop count — at scale you track
        paths only on traversals that need them."""
        if self._pos != "V":
            raise ValueError("with_path() starts at a vertex position")
        return Traversal(
            self._g, self._df.withColumn("_path", F.array(F.col("id"))), self._pos
        )

    def path(self) -> DataFrame:
        """The visited-vertex history (requires with_path()): one row per
        traverser, `path` = array of vertex ids from start to current."""
        if "_path" not in self._df.columns:
            raise ValueError("path() requires with_path() at the traversal start")
        return self._df.select(F.col("_path").alias("path"))

    # -- sack (per-traverser accumulator) ----------------------------------
    _SACK_OPS = {
        "sum": lambda s, v: s + v,
        "mult": lambda s, v: s * v,
        "min": F.least,
        "max": F.greatest,
    }

    def with_sack(self, init: float) -> "Traversal":
        """Gremlin withSack(init): give every traverser a numeric
        accumulator that rides through hops (a carried column — pure
        column arithmetic, no state store).  Fold edge properties into it
        with sack_by() at edge positions; read it with sack()."""
        if self._pos != "V":
            raise ValueError("with_sack() starts at a vertex position")
        return Traversal(
            self._g,
            self._df.withColumn("_sack", F.lit(float(init)).cast("double")),
            "V",
        )

    def sack_by(self, prop: str, op: str = "sum") -> "Traversal":
        """Gremlin sack(sum).by('prop'): fold the current edge's property
        into each traverser's sack (op: sum | mult | min | max; NULL
        property values leave the sack unchanged — Gremlin visits only
        elements that have the key).  Edge positions only: the edge row is
        in hand, so the fold is one codegen'd column expression."""
        if self._pos != "E":
            raise ValueError("sack_by() folds an EDGE property — call it "
                             "between out_e()/in_e() and in_v()/out_v()")
        if "_sack" not in self._df.columns:
            raise ValueError("sack_by() requires with_sack() earlier in the "
                             "traversal")
        if op not in self._SACK_OPS:
            raise ValueError(f"op must be one of {sorted(self._SACK_OPS)}")
        folded = self._SACK_OPS[op](F.col("_sack"), F.col(prop).cast("double"))
        new = F.when(F.col(prop).isNull(), F.col("_sack")).otherwise(folded)
        return Traversal(self._g, self._df.withColumn("_sack", new), "E")

    def sack(self) -> DataFrame:
        """The sack value per traverser: (id, sack) at vertex positions,
        (src, dst, sack) at edges."""
        if "_sack" not in self._df.columns:
            raise ValueError("sack() requires with_sack() at the start")
        keys = ["id"] if self._pos == "V" else ["src", "dst"]
        return self._df.select(*keys, F.col("_sack").alias("sack"))

    def split_sack(self, direction: str = "out", *labels: str) -> "Traversal":
        """Gremlin's sack SPLIT operator, specialized to the probability-mass
        idiom (withSack(1.0, splitOperator=divide-by-fanout)): before the
        next `direction` hop, divide each traverser's sack evenly among the
        children it is about to spawn — sack/degree, so
        `with_sack(1.0).split_sack('out').out().merge_sacks('sum')` is one
        random-walk step's visiting distribution.  Expressed as a degree
        aggregation joined in before the hop (pure DataFrame ops — degree is
        a map-side-combinable count, no per-traverser state); traversers on
        vertices with no matching edges keep their sack and die at the hop,
        exactly as in Gremlin."""
        if self._pos != "V":
            raise ValueError("split_sack() applies at a vertex position, "
                             "before the hop it splits for")
        if "_sack" not in self._df.columns:
            raise ValueError("split_sack() requires with_sack() earlier in "
                             "the traversal")
        key = {"out": ("src",), "in": ("dst",), "both": ("src", "dst")}.get(direction)
        if key is None:
            raise ValueError("direction must be 'out', 'in' or 'both'")
        parts = []
        for k in key:
            e = self._edges(labels, k)
            parts.append(e.select(F.col(k).alias("id")))
        adj = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        deg = adj.groupBy("id").agg(F.count(F.lit(1)).alias("_deg"))
        df = (self._df.join(deg, "id", "left")
              .withColumn("_sack", F.when(F.col("_deg").isNull(), F.col("_sack"))
                          .otherwise(F.col("_sack") / F.col("_deg")))
              .drop("_deg"))
        return Traversal(self._g, df, "V")

    def merge_sacks(self, op: str = "sum") -> "Traversal":
        """Gremlin's bulking MERGE operator (withSack(..., mergeOperator)):
        traversers with identical state — same position and the same carried
        as_() labels / path history — collapse into one, their sacks
        combined with `op` (sum | min | max; all order-independent, so the
        distributed aggregation is deterministic).  With integer-valued
        sacks and op='sum' this is exact path counting; after split_sack()
        it folds a step's probability mass per vertex.  One hash
        aggregation — the multiset of traversers never leaves the JVM."""
        if "_sack" not in self._df.columns:
            raise ValueError("merge_sacks() requires with_sack() earlier in "
                             "the traversal")
        ops = {"sum": F.sum, "min": F.min, "max": F.max}
        if op not in ops:
            raise ValueError(f"op must be one of {sorted(ops)}")
        group_cols = [c for c in self._df.columns if c != "_sack"]
        df = (self._df.groupBy(*group_cols)
              .agg(ops[op](F.col("_sack")).alias("_sack")))
        return Traversal(self._g, df, self._pos)

    def local_limit(self, step, n: int) -> "Traversal":
        """Gremlin local(t.limit(n)) — the by-far-most-common local() use:
        apply the sub-traversal PER TRAVERSER and keep each one's first `n`
        results (deterministic order: ascending result vertex id).  The
        sub-traversal runs once per DISTINCT current vertex (same
        per-distinct-vertex discipline as coalesce_/not_), the per-origin
        cut is a rank-over-window Catalyst rewrites to WindowGroupLimit
        (partial per-partition top-n before the shuffle — the skew-proof
        group-cap shape, functions/sampling.cap_per_group), and the cut
        results join back so incoming multiplicity is preserved."""
        if self._pos != "V":
            raise ValueError("local_limit() is supported at vertex positions")
        if self._carried():
            raise ValueError("local_limit() after as_()/with_path() is not "
                             "supported; apply labels after it")
        from pyspark.sql.window import Window

        verts = self._df.select("id").distinct()
        probe = Traversal(
            self._g, verts.withColumn("_as___origin", F.col("id")), "V")
        produced = step(probe)
        if produced._pos != "V":
            raise ValueError("local_limit()'s sub-traversal must end at vertices")
        w = Window.partitionBy("__origin").orderBy(F.col("id").asc())
        capped = (
            produced._df.select(F.col("_as___origin").alias("__origin"), "id")
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= n)
            .drop("__rank")
        )
        out = (self._df.select(F.col("id").alias("__origin"))
               .join(capped, "__origin").select("id"))
        return Traversal(self._g, out, "V")

    def not_(self, step) -> "Traversal":
        """Gremlin not(traversal): keep traversers for which the
        sub-traversal yields NO result.  The sub-traversal runs from the
        distinct current vertices with their origin riding along as a
        hidden as_() label (edge steps thread labels, so any step
        composition works); surviving origins are anti-joined out —
        one distributed anti-join, no per-traverser execution."""
        if self._pos != "V":
            raise ValueError("not_() is supported at vertex positions")
        probe = Traversal(
            self._g,
            self._df.select("id").distinct().withColumn("_as___origin", F.col("id")),
            "V",
        )
        out = step(probe)
        origins = out._df.select(F.col("_as___origin").alias("id")).distinct()
        return Traversal(self._g, self._df.join(origins, "id", "left_anti"), "V")

    def has_not(self, prop: str) -> "Traversal":
        """Gremlin hasNot(prop): elements where the property is absent
        (NULL in the sparse wide schema)."""
        if self._pos == "V":
            keep = self._g.vertices.filter(F.col(prop).isNull()).select("id")
            return Traversal(self._g, self._df.join(keep, "id"), "V")
        return Traversal(self._g, self._df.filter(F.col(prop).isNull()), "E")

    def where_(self, label: str, op: str = "!=") -> "Traversal":
        """Gremlin where(P.neq('a')) and friends: compare the CURRENT element
        id against an as_() label with `op` ('=', '!=', '<', ...).  Edge
        positions compare by the edge's source id (Gremlin's where() on an
        edge traverser compares the edge itself; ids here are vertex-typed,
        so the source anchors the comparison)."""
        col = f"_as_{label}"
        if col not in self._df.columns:
            raise ValueError(f"unknown as_() label: {label}")
        cur = F.col("id") if self._pos == "V" else F.col("src")
        return Traversal(self._g, self._df.filter(_OPS[op](cur, F.col(col))), self._pos)

    def order_by(self, prop: str, ascending: bool = True) -> "Traversal":
        """Gremlin order().by(prop, asc|desc): sort traversers by a property
        (vertex positions join the property in; edge positions sort on the
        edge column).  Ties broken by id for a deterministic order — order is
        observable through limit() and to_df().  At scale this is a global
        sort (range exchange); use only ahead of a limit, which Spark
        optimizes to a TakeOrdered that never materializes the full sort."""
        direction = (lambda c: c.asc()) if ascending else (lambda c: c.desc())
        if self._pos == "V":
            joined = self._df.join(self._g.vertices.select("id", prop), "id")
            out = joined.orderBy(direction(F.col(prop)), F.col("id").asc()) \
                .select(*self._df.columns)
        else:
            out = self._df.orderBy(direction(F.col(prop)), F.col("src").asc(),
                                   F.col("dst").asc())
        return Traversal(self._g, out, self._pos)

    # -- modulators / terminals -------------------------------------------
    def dedup(self) -> "Traversal":
        """Distinct traversers.  With as_()/with_path() active, distinctness
        is per (position, labels, path) — label a barrier'd id and dedup
        before as_() if you want element-only dedup."""
        return Traversal(self._g, self._df.distinct(), self._pos)

    def limit(self, n: int) -> "Traversal":
        return Traversal(self._g, self._df.limit(n), self._pos)

    def values(self, *props: str) -> DataFrame:
        """Project property values (joins the vertex table back in)."""
        if self._pos == "V":
            return self._df.join(self._g.vertices, "id").select("id", *props)
        return self._df.select("src", "dst", *props)

    def count(self) -> DataFrame:
        return self._df.agg(F.count(F.lit(1)).alias("n"))

    def to_df(self) -> DataFrame:
        return self._df

    def group_count(self, prop: str) -> DataFrame:
        """Gremlin groupCount().by(prop): histogram of a property over the
        current traversers (multiplicity-aware)."""
        joined = (
            self._df.join(self._g.vertices, "id") if self._pos == "V" else self._df
        )
        return joined.groupBy(prop).agg(F.count(F.lit(1)).alias("n"))

    _GROUP_AGGS = {
        # count with a value_prop counts NON-NULL values (Gremlin's
        # values(p).count() visits only traversers that HAVE p — significant
        # in the sparse wide schema), consistent with sum/avg/min/max's
        # null-skipping; bare count counts traversers
        "count": lambda c: F.count(F.lit(1)) if c is None else F.count(c),
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
    }

    def group_by(self, key_prop: str, agg: str = "count",
                 value_prop: str | None = None) -> DataFrame:
        """Gremlin group().by(key).by(valueAgg): traversers grouped by one
        property, aggregating another — e.g.
        `group().by('mktsegment').by(values('acctbal').sum())` is
        `group_by('mktsegment', 'sum', 'acctbal')`.  One property join + one
        hash aggregate (map-side partial), multiplicity-aware like Gremlin's
        (a traverser arriving twice counts twice).  Returns (key, value)."""
        if agg not in self._GROUP_AGGS:
            raise ValueError(f"agg must be one of {sorted(self._GROUP_AGGS)}")
        if agg != "count" and value_prop is None:
            raise ValueError(f"agg {agg!r} needs value_prop")
        cols = [key_prop] + ([value_prop] if value_prop else [])
        joined = (
            self._df.join(self._g.vertices.select("id", *dict.fromkeys(cols)), "id")
            if self._pos == "V" else self._df
        )
        measure = self._GROUP_AGGS[agg](F.col(value_prop)) if value_prop \
            else self._GROUP_AGGS[agg](None)
        return joined.groupBy(key_prop).agg(measure.alias("value"))

    def simple_path(self) -> "Traversal":
        """Gremlin simplePath(): keep traversers whose path history has no
        repeated vertex (requires with_path()).  A pure column predicate —
        size(path) == size(array_distinct(path)) — so it stays inside
        whole-stage codegen and filters each hop's output before the next
        join."""
        if "_path" not in self._df.columns:
            raise ValueError("simple_path() requires with_path() at the start")
        keep = F.size(F.col("_path")) == F.size(F.array_distinct(F.col("_path")))
        return Traversal(self._g, self._df.filter(keep), self._pos)

    def coalesce_(self, *steps) -> "Traversal":
        """Gremlin coalesce(t1, t2, ...): per traverser, the results of the
        FIRST sub-traversal that yields any.  The branches run once per
        DISTINCT current vertex (branch output depends only on the vertex),
        then join back to the incoming traversers — so k traversers parked
        on one vertex each emit that vertex's branch results (Gremlin
        multiplicity) while the branch work is deduplicated.  Rejected
        after as_()/with_path(): branch-internal hops can't extend the
        incoming history, so carrying it would silently lie."""
        if not steps:
            raise ValueError("coalesce_() needs at least one sub-traversal")
        if self._pos != "V":
            raise ValueError("coalesce_() is supported at vertex positions")
        if self._carried():
            raise ValueError("coalesce_() after as_()/with_path() is not "
                             "supported (branch hops cannot extend the "
                             "carried history); apply labels after it")
        remaining = self._df.select("id").distinct()
        produced_frames = []
        for step in steps:
            probe = Traversal(
                self._g, remaining.withColumn("_as___origin", F.col("id")), "V")
            produced = step(probe)
            if produced._pos != "V":
                raise ValueError("coalesce_() branches must end at vertices")
            frame = produced._df.select(
                F.col("_as___origin").alias("__origin"), "id")
            produced_frames.append(frame)
            satisfied = frame.select(F.col("__origin").alias("id")).distinct()
            remaining = remaining.join(satisfied, "id", "left_anti")
        prod = produced_frames[0]
        for f in produced_frames[1:]:
            prod = prod.unionByName(f)
        out = (self._df.select(F.col("id").alias("__origin"))
               .join(prod, "__origin").select("id"))
        return Traversal(self._g, out, "V")

    def optional(self, step) -> "Traversal":
        """Gremlin optional(t): t's results where it produces any, the
        incoming traverser unchanged where it doesn't.  Same per-distinct-
        vertex evaluation + join-back as coalesce_, so multiplicity is
        symmetric between the matched and fall-through sides; same
        as_()/with_path() rejection."""
        if self._pos != "V":
            raise ValueError("optional() is supported at vertex positions")
        if self._carried():
            raise ValueError("optional() after as_()/with_path() is not "
                             "supported; apply labels after it")
        verts = self._df.select("id").distinct()
        probe = Traversal(
            self._g, verts.withColumn("_as___origin", F.col("id")), "V")
        produced = step(probe)
        if produced._pos != "V":
            raise ValueError("optional()'s sub-traversal must end at vertices")
        prod = produced._df.select(F.col("_as___origin").alias("__origin"), "id")
        satisfied = prod.select(F.col("__origin").alias("id")).distinct()
        matched = (self._df.select(F.col("id").alias("__origin"))
                   .join(prod, "__origin").select("id"))
        kept = self._df.join(satisfied, "id", "left_anti").select("id")
        return Traversal(self._g, matched.unionByName(kept), "V")

    def both_e(self, *labels: str) -> "Traversal":
        """Vertex → incident edges in BOTH directions (one traverser per
        incidence — an edge between two current traversers appears twice,
        Gremlin's bothE multiplicity).  Each direction reads its
        direction-matching edge copy."""
        carried = self._carried()
        if carried:
            raise ValueError("both_e() after as_()/path() is ambiguous: "
                             "an edge has no single anchor vertex; use "
                             "out_e()/in_e() explicitly")
        out_side = self._edges(labels).join(
            self._df.select(F.col("id").alias("src")).distinct(), "src")
        in_side = self._edges(labels, "dst").join(
            self._df.select(F.col("id").alias("dst")).distinct(), "dst")
        return Traversal(
            self._g,
            out_side.unionByName(in_side.select(*out_side.columns)), "E")

    def union_(self, *steps) -> "Traversal":
        """Gremlin union(t1, t2, ...): run each sub-traversal from the
        current traversers and emit every result (multiplicity adds, like
        Gremlin).  All branches must land on the same position; each branch
        stays one Catalyst plan and the union is a zero-shuffle bag merge."""
        if not steps:
            raise ValueError("union_() needs at least one sub-traversal")
        outs = [step(self) for step in steps]
        positions = {t._pos for t in outs}
        if len(positions) != 1:
            raise ValueError("union_() branches must end at the same position")
        cols = outs[0]._df.columns
        if any(sorted(t._df.columns) != sorted(cols) for t in outs):
            raise ValueError(
                "union_() branches must carry the same columns "
                "(apply as_()/with_path() before the union, not inside one branch)")
        df = outs[0]._df
        for t in outs[1:]:
            df = df.unionByName(t._df)
        return Traversal(self._g, df, positions.pop())


class Graph:
    """Entry point: `g = Graph(spark, sf_dir); g.V()...` — the engine-side
    stand-in for a Gremlin GraphTraversalSource."""

    def __init__(self, spark, sf_dir: str, store: GraphStore | None = None):
        self._store = store or GraphStore(spark, sf_dir)
        self.vertices = self._store.vertices()
        self.edges = self._store.edges()
        self.edges_by_dst = self._store.edges(order_by="dst")

    def V(self, *ids: int) -> Traversal:
        base = self.vertices.select("id")
        if ids:
            base = base.filter(F.col("id").isin(list(ids)))
        return Traversal(self, base, "V")

    def E(self, *labels: str) -> Traversal:
        e = self.edges
        if labels:
            e = e.filter(F.col("label").isin(list(labels)))
        return Traversal(self, e, "E")
