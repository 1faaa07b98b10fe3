"""Gremlin-flavored traversal DSL: semantics on the fixture graph."""

from __future__ import annotations

import pytest

from hugegraph_on_tikv_spark.sources.graph import ID_BASE, LABEL_CODES
from hugegraph_on_tikv_spark.traversal_api import Graph
from tests.conftest import SF_DIR


def vid(label, key):
    return LABEL_CODES[label] * ID_BASE + key


@pytest.fixture(scope="module")
def g(spark):
    return Graph(spark, SF_DIR)


def test_v_count_equals_vertex_table(g):
    assert g.V().count().collect()[0]["n"] == g.vertices.count()


def test_has_label_and_has_filters(g, spark):
    n = g.V().has_label("customer").has("mktsegment", "BUILDING").count().collect()[0]["n"]
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    expected = (
        load_table(spark, SF_DIR, "customer").filter("c_mktsegment = 'BUILDING'").count()
    )
    assert n == expected


def test_out_preserves_multiplicity(g, spark):
    # every order placed by customer 1 = one traverser; equals orders rows
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    n = g.V(vid("customer", 1)).out("placed").count().collect()[0]["n"]
    expected = load_table(spark, SF_DIR, "orders").filter("o_custkey = 1").count()
    assert n == expected


def test_two_hop_count_matches_join(g, spark):
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    n = (
        g.V().has_label("customer").has("mktsegment", "BUILDING")
        .out("placed").out("contains").count().collect()[0]["n"]
    )
    c = load_table(spark, SF_DIR, "customer").filter("c_mktsegment = 'BUILDING'")
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    expected = (
        c.join(o, c.c_custkey == o.o_custkey).join(li, o.o_orderkey == li.l_orderkey).count()
    )
    assert n == expected


def test_in_and_dedup(g, spark):
    # customers having placed at least one order = distinct in_('placed') over orders
    n = g.V().has_label("order").in_("placed").dedup().count().collect()[0]["n"]
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    expected = load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert n == expected


def test_edge_steps_and_group_count(g):
    hist = {
        r["label"]: r["n"]
        for r in g.E().to_df().groupBy("label").count()
        .withColumnRenamed("count", "n").collect()
    }
    # out_e from all parts on supplied_by = that label's edge count
    n = g.V().has_label("part").out_e("supplied_by").count().collect()[0]["n"]
    assert n == hist["supplied_by"]
    # edge→vertex: in_v of placed edges lands on orders
    orders = g.V().has_label("order").count().collect()[0]["n"]
    placed_targets = g.E("placed").in_v().dedup().count().collect()[0]["n"]
    assert placed_targets <= orders


def test_has_predicate_tuple(g):
    big = g.V().has_label("part").has("size", (">=", 40)).values("size")
    rows = big.collect()
    assert len(rows) > 0 and all(r["size"] >= 40 for r in rows)


def test_as_select_pairs(g, spark):
    """as_()/select(): labeled positions ride through hops and come back as
    one column per label, multiplicity preserved."""
    from pyspark.sql import functions as F

    pairs = (
        g.V().has_label("customer").has("mktsegment", "BUILDING").as_("c")
        .out("placed").as_("o").select("c", "o")
    )
    expected = (
        g.edges.filter(F.col("label") == "placed")
        .join(g.vertices.filter((F.col("label") == "customer")
                                & (F.col("mktsegment") == "BUILDING"))
              .select(F.col("id").alias("src")), "src")
        .select(F.col("src").alias("c"), F.col("dst").alias("o"))
    )
    assert sorted(pairs.collect()) == sorted(expected.collect())


def test_path_tracks_visited_vertices(g, spark):
    from pyspark.sql import functions as F

    start = g.vertices.filter(F.col("label") == "customer").agg(F.min("id")).collect()[0][0]
    paths = g.V(int(start)).with_path().out("placed").out("contains").path().collect()
    assert len(paths) > 0
    for row in paths:
        assert len(row["path"]) == 3           # start, order, part
        assert row["path"][0] == start


def test_path_requires_with_path(g):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="with_path"):
        g.V().out("placed").path()


def test_select_unknown_label_rejected(g):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown as_"):
        g.V().as_("a").out("placed").select("b")


def test_edge_steps_thread_as_labels(g, spark):
    """as_() labels survive out_e()/in_v() (edge-position steps thread the
    carried columns instead of dropping them)."""
    from pyspark.sql import functions as F

    pairs = (
        g.V().has_label("customer").has("mktsegment", "BUILDING").as_("c")
        .out_e("placed").in_v().as_("o").select("c", "o")
    )
    expected = (
        g.edges.filter(F.col("label") == "placed")
        .join(g.vertices.filter((F.col("label") == "customer")
                                & (F.col("mktsegment") == "BUILDING"))
              .select(F.col("id").alias("src")), "src")
        .select(F.col("src").alias("c"), F.col("dst").alias("o"))
    )
    assert sorted(pairs.collect()) == sorted(expected.collect())


def test_where_neq_label(g, spark):
    """where_(label, '!='): c.out.in_ back-traversals that exclude returning
    to the start — classic Gremlin where(neq('a'))."""
    from pyspark.sql import functions as F

    # parts supplied by the same supplier as part X, excluding X itself
    t = (
        g.V().has_label("part").as_("p").out("supplied_by").in_("supplied_by")
    )
    with_self = t.to_df().count()
    without_self = t.where_("p").to_df().count()
    same = t.where_("p", "=").to_df().count()
    assert with_self == without_self + same
    assert same > 0 and without_self > 0


def test_order_by_limit(g):
    rows = (
        g.V().has_label("part").order_by("size", ascending=False).limit(5)
        .values("size").collect()
    )
    sizes = [r["size"] for r in rows]
    assert sizes == sorted(sizes, reverse=True) and len(sizes) == 5


def test_path_requires_vertex_position(g):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vertex position"):
        g.E("placed").with_path()


def test_not_step_excludes_matching_traversers(g, spark):
    """not_(out('placed')): customers with no orders — anti-join semantics,
    verified against the direct relational formulation."""
    from pyspark.sql import functions as F

    total = g.V().has_label("customer").count().collect()[0]["n"]
    with_orders = (
        g.V().has_label("customer").not_(lambda t: t.out("placed")).count()
        .collect()[0]["n"]
    )
    direct = (
        g.vertices.filter(F.col("label") == "customer")
        .join(g.edges.filter(F.col("label") == "placed")
              .select(F.col("src").alias("id")).distinct(), "id", "left_anti")
        .count()
    )
    assert with_orders == direct
    assert 0 <= with_orders < total


def test_not_step_composes_with_two_hops(g):
    """not_ over a 2-step sub-traversal (edge-position steps carry the
    hidden origin label)."""
    n = (
        g.V().has_label("customer")
        .not_(lambda t: t.out_e("placed").in_v())
        .count().collect()[0]["n"]
    )
    m = g.V().has_label("customer").not_(lambda t: t.out("placed")).count() \
        .collect()[0]["n"]
    assert n == m  # same reachability, different step composition


def test_has_not_property(g):
    from pyspark.sql import functions as F

    n = g.V().has_label("order").has_not("mktsegment").count().collect()[0]["n"]
    total = g.vertices.filter(F.col("label") == "order").count()
    assert n == total  # orders never carry mktsegment in the sparse schema
    with_seg = g.V().has_label("customer").has_not("mktsegment").count().collect()[0]["n"]
    assert with_seg == 0


def test_dsl_routes_through_dual_bucketed_layout(g, spark, tmp_path):
    """A layout-backed store routes in_() through the by-dst bucketed copy
    (visible as a catalog-table scan in the plan) and returns the same
    traversers as the default store."""
    from hugegraph_on_tikv_spark.sources.graph import GraphStore

    store = GraphStore(spark, SF_DIR)
    layout = store.materialize_dual_layout(
        str(tmp_path / "dual"), buckets=8, name="t_dsl_edges")
    try:
        gb = Graph(spark, SF_DIR, store=store)
        t_plain = g.V(vid("nation", 3)).in_("located_in")
        t_bucketed = gb.V(vid("nation", 3)).in_("located_in")
        assert sorted(r["id"] for r in t_bucketed.to_df().collect()) == \
            sorted(r["id"] for r in t_plain.to_df().collect())
        plan = t_bucketed.to_df()._jdf.queryExecution().executedPlan().toString()
        assert "t_dsl_edges_by_dst" in plan, plan
        out_plan = gb.V(vid("customer", 1)).out("placed").to_df() \
            ._jdf.queryExecution().executedPlan().toString()
        assert "t_dsl_edges_by_src" in out_plan, out_plan
    finally:
        layout.drop()


def test_group_by_count_and_sum(g, spark):
    """group().by(key).by(agg): histogram and per-key sum against direct SQL
    over the base table."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.catalog import load_table

    cust = load_table(spark, SF_DIR, "customer")
    got = {r["mktsegment"]: r["value"]
           for r in g.V().has_label("customer").group_by("mktsegment").collect()}
    want = {r["c_mktsegment"]: r["n"]
            for r in cust.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n")).collect()}
    assert got == want

    got_sum = {r["mktsegment"]: round(r["value"], 2)
               for r in g.V().has_label("customer")
               .group_by("mktsegment", "sum", "acctbal").collect()}
    want_sum = {r["c_mktsegment"]: round(r["s"], 2)
                for r in cust.groupBy("c_mktsegment").agg(
                    F.sum("c_acctbal").alias("s")).collect()}
    assert got_sum == want_sum

    # multiplicity-aware: two hops landing on one nation count twice
    mult = {r["name"]: r["value"]
            for r in g.V().has_label("customer").out("located_in")
            .group_by("name").collect()}
    assert sum(mult.values()) == cust.count()  # one traverser per customer

    with pytest.raises(ValueError):
        g.V().group_by("mktsegment", "sum")  # sum needs value_prop
    with pytest.raises(ValueError):
        g.V().group_by("mktsegment", "median", "acctbal")

    # count WITH a value_prop counts non-null values only (Gremlin's
    # values(p).count() semantics in the sparse wide schema)
    n_cust = cust.count()
    by_label = {r["label"]: r["value"] for r in
                g.V().group_by("label", "count", "acctbal").collect()}
    assert by_label["customer"] == n_cust
    assert by_label.get("order", 0) == 0  # orders never carry acctbal


def test_simple_path_filters_backtracking(g):
    """customer → nation → (customers in nation): without simple_path the
    2-hop both() walk returns to the start; with it, the start is excluded."""
    start = vid("customer", 1)
    t = (g.V(start).with_path()
         .out("located_in").in_("located_in"))
    with_back = [r["id"] for r in t.to_df().collect()]
    assert start in with_back  # the backtracking traverser exists...
    simple = [r["id"] for r in
              g.V(start).with_path().out("located_in").in_("located_in")
              .simple_path().to_df().collect()]
    assert start not in simple  # ...and simple_path removes exactly it
    assert sorted(simple) == sorted(x for x in with_back if x != start)
    with pytest.raises(ValueError):
        g.V(start).simple_path()  # requires with_path()


def test_union_merges_branches(g, spark):
    """union(out('placed'), out('located_in')): both branches' traversers,
    multiplicity additive."""
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    start = vid("customer", 1)
    n_orders = load_table(spark, SF_DIR, "orders").filter("o_custkey = 1").count()
    got = (g.V(start)
           .union_(lambda t: t.out("placed"), lambda t: t.out("located_in"))
           .count().collect()[0]["n"])
    assert got == n_orders + 1  # orders + the one nation hop

    # branches must land on the same position
    with pytest.raises(ValueError):
        g.V(start).union_(lambda t: t.out("placed"), lambda t: t.out_e("placed"))
    with pytest.raises(ValueError):
        g.V(start).union_()


def test_coalesce_first_producing_branch_wins(g, spark):
    """coalesce(out('placed'), out('located_in')): customers with orders
    emit their orders; orderless customers fall through to their nation."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.catalog import load_table

    custs = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    with_orders = {r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()}
    n_without = custs.count() - len(with_orders)
    n_orders = orders.count()
    got = (g.V().has_label("customer")
           .coalesce_(lambda t: t.out("placed"), lambda t: t.out("located_in"))
           .count().collect()[0]["n"])
    # customers with orders contribute one traverser per order; the rest
    # contribute exactly their single nation hop
    assert got == n_orders + n_without
    with pytest.raises(ValueError):
        g.V().coalesce_()
    with pytest.raises(ValueError):
        g.V().as_("a").coalesce_(lambda t: t.out("placed"))

    # per-traverser multiplicity: k traversers parked on one nation each
    # emit that nation's branch results (Gremlin semantics)
    from pyspark.sql import functions as F

    locs = {}  # nation id -> incoming customer-traverser count
    for r in g.V().has_label("customer").out("located_in").to_df().collect():
        locs[r["id"]] = locs.get(r["id"], 0) + 1
    per_nation = {r["dst"]: r["n"] for r in
                  g.edges.filter(F.col("label") == "located_in")
                  .groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    want_mult = sum(k * per_nation[n] for n, k in locs.items())
    got_mult = (g.V().has_label("customer").out("located_in")
                .coalesce_(lambda t: t.in_("located_in"))
                .count().collect()[0]["n"])
    assert got_mult == want_mult


def test_optional_keeps_unproductive_traversers(g, spark):
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    custs = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    with_orders = {r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()}
    got = (g.V().has_label("customer").optional(lambda t: t.out("placed"))
           .count().collect()[0]["n"])
    assert got == orders.count() + (custs.count() - len(with_orders))


def test_both_e_incidence_multiplicity(g, spark):
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    # nation vertex: in-edges from customers and suppliers located there
    n3 = vid("nation", 3)
    got = g.V(n3).both_e("located_in").count().collect()[0]["n"]
    custs = load_table(spark, SF_DIR, "customer").filter("c_nationkey = 3").count()
    supps = load_table(spark, SF_DIR, "supplier").filter("s_nationkey = 3").count()
    assert got == custs + supps
    with pytest.raises(ValueError):
        g.V(n3).as_("a").both_e("located_in")


def test_repeat_emit_unions_frontiers(g, spark):
    # emit(): bag-union of frontier1 (orders) and frontier2 (per-lineitem
    # parts), multiplicity preserved
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    start = vid("customer", 1)
    n = (
        g.V(start).repeat(lambda t: t.out("placed", "contains"), 2, emit=True)
        .count().collect()[0]["n"]
    )
    o = load_table(spark, SF_DIR, "orders").filter("o_custkey = 1")
    li = load_table(spark, SF_DIR, "lineitem")
    h1 = o.count()
    h2 = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n == h1 + h2

    # emit_first additionally emits the incoming traverser itself
    n_first = (
        g.V(start).repeat(lambda t: t.out("placed", "contains"), 2,
                          emit=True, emit_first=True)
        .count().collect()[0]["n"]
    )
    assert n_first == n + 1


def test_repeat_without_emit_unchanged(g):
    plain = g.V(vid("customer", 1)).repeat(lambda t: t.out("placed", "contains"), 2)
    emitted = g.V(vid("customer", 1)).repeat(
        lambda t: t.out("placed", "contains"), 2, emit=True)
    # the non-emit form returns only the final frontier, a subset count
    assert plain.count().collect()[0]["n"] < emitted.count().collect()[0]["n"]


def test_match_bindings_and_multiplicity(g, spark):
    # (a placed b), (b contains c): one assignment per (customer, order,
    # lineitem) — identical to the relational join count
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    m = (
        g.V().has_label("customer").has("mktsegment", "BUILDING")
        .match_(
            ("a", lambda t: t.out("placed"), "b"),
            ("b", lambda t: t.out("contains"), "c"),
        )
    )
    c = load_table(spark, SF_DIR, "customer").filter("c_mktsegment = 'BUILDING'")
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    expected = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey).count()
    )
    assert m.count().collect()[0]["n"] == expected
    # select() retrieves every bound label
    rows = m.select("a", "b", "c")
    assert sorted(rows.columns) == ["a", "b", "c"]
    assert rows.count() == expected


def test_match_cyclic_clause_is_equality_constraint(g):
    # (a placed b) + (b in_placed a): the second clause re-binds an already-
    # bound label, becoming a both-column equality join.  Every order has
    # exactly one placing customer, so the constraint holds for all rows.
    base = g.V().has_label("customer").has("mktsegment", "BUILDING")
    once = base.match_(("a", lambda t: t.out("placed"), "b"))
    cyc = base.match_(
        ("a", lambda t: t.out("placed"), "b"),
        ("b", lambda t: t.in_("placed"), "a"),
    )
    assert once.count().collect()[0]["n"] == cyc.count().collect()[0]["n"]


def test_match_rejects_unbound_from_label(g):
    # the FIRST clause's from-label is seeded by the incoming traversers;
    # any LATER clause must start from an already-bound label
    with pytest.raises(ValueError, match="not bound"):
        g.V().has_label("customer").match_(
            ("a", lambda t: t.out("placed"), "b"),
            ("z", lambda t: t.out("contains"), "c"))


def test_match_incoming_multiplicity_multiplies(g, spark):
    # two traversers parked on the same customer double its assignments
    from pyspark.sql import functions as F

    base = g.V(vid("customer", 1))
    doubled = base.union_(lambda t: t, lambda t: t)  # 2 traversers, same vertex
    n1 = base.match_(("a", lambda t: t.out("placed"), "b")).count().collect()[0]["n"]
    n2 = doubled.match_(("a", lambda t: t.out("placed"), "b")).count().collect()[0]["n"]
    assert n2 == 2 * n1


def test_sack_accumulates_edge_property(g, spark):
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    # per-lineitem traverser carries its folded quantity
    rows = (
        g.V(vid("customer", 1)).out("placed").with_sack(0.0)
        .out_e("contains").sack_by("quantity").in_v().sack().collect()
    )
    o = load_table(spark, SF_DIR, "orders").filter("o_custkey = 1")
    li = load_table(spark, SF_DIR, "lineitem")
    expected = sorted(
        r["l_quantity"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
    )
    assert sorted(r["sack"] for r in rows) == expected

    # chained folds compose (sum then mult)
    rows2 = (
        g.V(vid("customer", 1)).out("placed").with_sack(1.0)
        .out_e("contains").sack_by("quantity", "mult")
        .sack_by("linenumber", "sum").in_v().sack().collect()
    )
    expected2 = sorted(
        r["l_quantity"] * 1.0 + r["l_linenumber"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
    )
    assert sorted(r["sack"] for r in rows2) == pytest.approx(expected2)


def test_sack_requires_with_sack_and_edge_position(g):
    with pytest.raises(ValueError, match="with_sack"):
        g.V(vid("customer", 1)).out_e("placed").sack_by("orderdate")
    with pytest.raises(ValueError, match="EDGE"):
        g.V(vid("customer", 1)).with_sack(0.0).sack_by("acctbal")


def test_sack_null_property_leaves_sack_unchanged(g):
    # 'quantity' is NULL on placed edges; folding it must be a no-op
    rows = (
        g.V(vid("customer", 1)).with_sack(7.0)
        .out_e("placed").sack_by("quantity").in_v().sack().collect()
    )
    assert rows and all(r["sack"] == 7.0 for r in rows)


def test_local_limit_caps_per_origin(g, spark):
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    capped = (
        g.V().has_label("customer").has("mktsegment", "BUILDING")
        .local_limit(lambda t: t.out("placed"), 3)
    )
    c = load_table(spark, SF_DIR, "customer").filter("c_mktsegment = 'BUILDING'")
    o = load_table(spark, SF_DIR, "orders")
    from pyspark.sql import functions as F

    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey).groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.least(F.col("cnt"), F.lit(3)).alias("m"))
        .agg(F.sum("m").alias("total")).collect()[0]["total"]
    )
    assert capped.count().collect()[0]["n"] == per_cust

    # deterministic cut: the kept orders are the lowest vertex ids
    one = g.V(vid("customer", 1)).local_limit(lambda t: t.out("placed"), 2)
    all_orders = sorted(
        r["id"] for r in g.V(vid("customer", 1)).out("placed").to_df().collect()
    )
    assert sorted(r["id"] for r in one.to_df().collect()) == all_orders[:2]


def test_local_limit_multiplicity_multiplies(g):
    base = g.V(vid("customer", 1))
    doubled = base.union_(lambda t: t, lambda t: t)
    n1 = base.local_limit(lambda t: t.out("placed"), 2).count().collect()[0]["n"]
    n2 = doubled.local_limit(lambda t: t.out("placed"), 2).count().collect()[0]["n"]
    assert n2 == 2 * n1


def test_match_solver_reorders_out_of_order_clauses(g):
    # clause 2 ('c' supplied_by 's') depends on clause 3 ('b' contains 'c');
    # the forward-chaining pass defers it — same result as written in order.
    # (The FIRST clause always stays first: its from-label is what the
    # incoming traversers bind to.)
    base = g.V().has_label("customer").has("mktsegment", "BUILDING")
    placed = lambda t: t.out("placed")
    contains = lambda t: t.out("contains")
    supplied = lambda t: t.out("supplied_by")
    in_order = base.match_(
        ("a", placed, "b"), ("b", contains, "c"), ("c", supplied, "s"))
    shuffled = base.match_(
        ("a", placed, "b"), ("c", supplied, "s"), ("b", contains, "c"))
    n1 = in_order.count().collect()[0]["n"]
    n2 = shuffled.count().collect()[0]["n"]
    assert n1 == n2 > 0


def test_merge_sacks_counts_paths_exactly(g, spark):
    """with_sack(1.0) + merge_sacks('sum') = exact path counting: the
    merged sack at each 2-hop target equals the number of distinct
    (order, lineitem) routes reaching it — integer-valued doubles, exact."""
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    rows = (
        g.V(vid("customer", 1)).with_sack(1.0)
        .out("placed").out("contains").merge_sacks("sum").sack().collect()
    )
    o = load_table(spark, SF_DIR, "orders").filter("o_custkey = 1")
    li = load_table(spark, SF_DIR, "lineitem")
    import collections

    expected = collections.Counter(
        vid("part", r["l_partkey"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
    )
    got = {r["id"]: r["sack"] for r in rows}
    assert got == {k: float(v) for k, v in expected.items()}
    # multiplicity collapsed: one traverser per reached vertex
    assert len(rows) == len(expected)


def test_split_sack_conserves_probability_mass(g, spark):
    """split_sack('out') + out() + merge_sacks('sum'): each seed's unit
    mass is divided among its children, so the total outgoing mass equals
    the number of seeds that have at least one matching out-edge."""
    from pyspark.sql import functions as F

    seeds = g.V().has_label("nation")   # 25 nations, each -> 1 region
    dist = (seeds.with_sack(1.0).split_sack("out", "part_of")
            .out("part_of").merge_sacks("sum").sack())
    total = dist.agg(F.sum("sack")).collect()[0][0]
    assert total == pytest.approx(25.0)
    # 25 nations over 5 regions, 5 each: every region's mass is 5 x 1/1
    assert sorted(r["sack"] for r in dist.collect()) == pytest.approx([5.0] * 5)

    # two-step: customer -> nation -> region, mass splits by degree at
    # each step and still sums to the number of seeds
    seeds2 = g.V().has_label("customer").has("mktsegment", "MACHINERY")
    n_seeds = seeds2.count().collect()[0]["n"]
    dist2 = (seeds2.with_sack(1.0)
             .split_sack("out", "located_in").out("located_in")
             .split_sack("out", "part_of").out("part_of")
             .merge_sacks("sum").sack())
    total2 = dist2.agg(F.sum("sack")).collect()[0][0]
    assert total2 == pytest.approx(float(n_seeds))


def test_merge_sacks_min_and_validation(g):
    rows = (
        g.V(vid("customer", 1)).with_sack(0.0)
        .out("placed").out_e("contains").sack_by("quantity")
        .in_v().merge_sacks("min").sack().collect()
    )
    assert rows and all(r["sack"] >= 1.0 for r in rows)
    with pytest.raises(ValueError, match="with_sack"):
        g.V(vid("customer", 1)).merge_sacks()
    with pytest.raises(ValueError, match="one of"):
        g.V(vid("customer", 1)).with_sack(1.0).merge_sacks("mult")
    with pytest.raises(ValueError, match="direction"):
        g.V(vid("customer", 1)).with_sack(1.0).split_sack("sideways")


def test_value_map_vertex_and_edge(g, spark):
    """valueMap(): per-traverser property projection; NULL for properties
    the element lacks (the relational translation of map-key omission)."""
    rows = (g.V(vid("customer", 1), vid("customer", 2))
            .value_map("name", "mktsegment").collect())
    assert len(rows) == 2
    assert all(r["name"].startswith("Customer#") for r in rows)
    # nation vertices have no mktsegment: NULL, never dropped rows
    nm = g.V(vid("nation", 1)).value_map("name", "mktsegment").collect()
    assert len(nm) == 1 and nm[0]["mktsegment"] is None
    with pytest.raises(ValueError, match="unknown vertex"):
        g.V().value_map("no_such_prop")
    # edge position: project edge columns
    er = (g.V(vid("customer", 1)).out_e("placed")
          .value_map("src", "dst", "label").collect())
    assert er and all(r["label"] == "placed" for r in er)


def test_project_properties_and_substep_counts(g, spark):
    """project(): one column per selector; callable selectors fold to
    per-traverser result counts (the by(out().count()) idiom)."""
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    out = {r["cust"]: r for r in
           (g.V(vid("customer", 1), vid("customer", 2), vid("customer", 4))
            .project_(cust="id", seg="mktsegment",
                      n_orders=lambda t: t.out("placed"))
            .collect())}
    orders = load_table(spark, SF_DIR, "orders")
    for k in (1, 2, 4):
        want = orders.filter(f"o_custkey = {k}").count()
        assert out[vid("customer", k)]["n_orders"] == want
        assert out[vid("customer", k)]["seg"] is not None
    with pytest.raises(ValueError, match="unknown vertex property"):
        g.V().project_(x="nope")


def test_project_zero_count_branch(g):
    # a vertex with no out-edges of the label: count must be 0, row kept
    rows = (g.V(vid("region", 1))
            .project_(rid="id", n_placed=lambda t: t.out("placed"))
            .collect())
    assert len(rows) == 1 and rows[0]["n_placed"] == 0


def test_choose_routes_each_traverser_once(g, spark):
    """choose(pred, a, b): BUILDING customers hop to their orders, others
    stay put — total traverser count = orders-of-building + non-building."""
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    seeds = g.V().has_label("customer")
    routed = seeds.choose_(("mktsegment", "BUILDING"),
                           lambda t: t.out("placed"))
    n = routed.count().collect()[0]["n"]
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    building = c.filter("c_mktsegment = 'BUILDING'")
    want = (building.join(o, building.c_custkey == o.o_custkey).count()
            + c.filter("c_mktsegment <> 'BUILDING'").count())
    assert n == want


def test_choose_three_arg_and_position_check(g):
    # explicit false branch; both branches one hop -> same position
    n = (g.V().has_label("nation")
         .choose_(("name", "prefix", "A"),
                  lambda t: t.out("part_of"),
                  lambda t: t.out("part_of"))
         .count().collect()[0]["n"])
    assert n == 25                      # every nation hops either way
    with pytest.raises(ValueError, match="same position"):
        g.V().has_label("nation").choose_(
            ("name", "prefix", "A"),
            lambda t: t.out_e("part_of"))


def test_value_map_preserves_multiplicity(g):
    # customer 1 out to its orders then back in_: multiple traversers can
    # sit on one vertex — valueMap emits one row per traverser, not per id
    t = g.V(vid("customer", 1)).out("placed").in_("placed")
    n_traversers = t.count().collect()[0]["n"]
    rows = t.value_map("name").collect()
    assert len(rows) == n_traversers > 1


def test_choose_carries_as_labels_across_branches(g, spark):
    """A label bound before choose_ survives both branches; the branch
    that unions in columns the other lacks yields NULLs, never an error."""
    from pyspark.sql import functions as F

    seeds = g.V().has_label("nation").as_("n")
    routed = seeds.choose_(("name", "prefix", "A"),
                           lambda t: t.out("part_of"),
                           lambda t: t)
    pairs = routed.select("n")
    assert pairs.count() == 25          # every nation exactly once
    # labeled origin still resolvable after the branch union
    assert pairs.distinct().count() == 25
