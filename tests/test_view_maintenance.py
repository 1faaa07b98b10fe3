"""Incremental view maintenance: maintained views must equal a full
recompute after any batch sequence, survive micro-batch redelivery
unchanged, and merge without touching the base table."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.catalog import load_events, load_table
from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog
from hugegraph_on_tikv_spark.streaming import view_maintenance as vm
from tests.conftest import SF_DIR


def _events(spark):
    return load_events(spark, SF_DIR).select("event_id", "event_type", "value")


def _expected(events):
    return (events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.round(F.col("value") * vm.SUM_SCALE).cast("long"))
         / F.lit(float(vm.SUM_SCALE))).alias("sum_value")))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_agg_view_batches_equal_full_recompute(spark, tmp_path):
    events = _events(spark)
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], ["value"],
                       events.filter(F.lit(False)))
    for i in range(3):
        applied = vm.agg_view_apply_delta(
            catalog, "by_type", events.filter(F.col("event_id") % 3 == i), i)
        assert applied
    assert _rows(vm.agg_view_read(catalog, "by_type")) == _rows(_expected(events))


def test_agg_view_replay_is_idempotent(spark, tmp_path):
    events = _events(spark)
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], ["value"],
                       events.filter(F.col("event_id") % 2 == 0))
    batch = events.filter(F.col("event_id") % 2 == 1)
    assert vm.agg_view_apply_delta(catalog, "by_type", batch, 0)
    before = _rows(vm.agg_view_read(catalog, "by_type"))
    # at-least-once redelivery of the same micro-batch: detected via the
    # batch-id watermark stored in the same atomic swap as the data
    assert not vm.agg_view_apply_delta(catalog, "by_type", batch, 0)
    assert _rows(vm.agg_view_read(catalog, "by_type")) == before
    assert before == _rows(_expected(events))


def test_agg_view_stream_end_to_end(spark, tmp_path):
    """The real writeStream path: a file-stream of event chunks drives the
    maintained view to the full-recompute answer."""
    events = _events(spark)
    src = tmp_path / "stream_src"
    for i in range(2):
        events.filter(F.col("event_id") % 2 == i).write.mode(
            "append").parquet(str(src))
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], ["value"],
                       events.filter(F.lit(False)))
    stream = (spark.readStream
              .schema("event_id long, event_type string, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src)))
    q = vm.agg_view_stream(stream, catalog, "by_type",
                           str(tmp_path / "chk"))
    q.awaitTermination(120)
    assert _rows(vm.agg_view_read(catalog, "by_type")) == _rows(_expected(events))
    assert catalog.view_meta("by_type")["last_batch_id"] >= 1  # >1 micro-batch


def test_agg_view_hll_measure_tracks_distincts(spark, tmp_path):
    """An HLL measure in a maintained view: per-batch sketches merge by
    union, and the final estimate tracks the exact distinct count within
    the sketch's error bound — approximate-distinct is the one aggregate
    that is only incrementally maintainable in sketch form."""
    events = load_events(spark, SF_DIR).select("event_id", "event_type", "user_id")
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], [],
                       events.filter(F.lit(False)), hll_cols=["user_id"])
    for i in range(3):
        assert vm.agg_view_apply_delta(
            catalog, "by_type", events.filter(F.col("event_id") % 3 == i), i)
    got = {r["event_type"]: r["distinct_user_id"]
           for r in vm.agg_view_read(catalog, "by_type").collect()}
    exact = {r["event_type"]: r["n"] for r in
             events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.05 * n), (k, got[k], n)


def test_agg_view_stream_checkpoint_restart(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint: the restarted stream
    must process only files that arrived after the first run — Spark's
    source tracking and the view's batch-id watermark composing to
    exactly-once across restarts."""
    events = _events(spark)
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    first.write.mode("append").parquet(str(src))
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], ["value"],
                       events.filter(F.lit(False)))
    schema = "event_id long, event_type string, value double"
    chk = str(tmp_path / "chk")

    def run_once():
        q = vm.agg_view_stream(
            spark.readStream.schema(schema).parquet(str(src)),
            catalog, "by_type", chk)
        q.awaitTermination(120)

    run_once()
    assert _rows(vm.agg_view_read(catalog, "by_type")) == _rows(_expected(first))
    second.write.mode("append").parquet(str(src))
    run_once()  # restart from the same checkpoint
    assert _rows(vm.agg_view_read(catalog, "by_type")) == _rows(_expected(events))
    run_once()  # nothing new: a third restart must change nothing
    assert _rows(vm.agg_view_read(catalog, "by_type")) == _rows(_expected(events))


def test_projection_view_partsupp_incremental(spark, tmp_path):
    """The derived-partsupp shape maintained from a lineitem stream: distinct
    (partkey, suppkey) + arithmetic derived columns, upserted per batch —
    equals the full derivation without ever re-reading prior batches."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey")
    derived = {"ps_availqty": "(l_partkey * 7 + l_suppkey) % 9999 + 1"}
    src = tmp_path / "li_src"
    for i in range(2):
        li.filter(F.col("l_orderkey") % 2 == i).write.mode(
            "append").parquet(str(src))
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    empty = li.filter(F.lit(False)).selectExpr(
        "l_partkey", "l_suppkey",
        f"{derived['ps_availqty']} AS ps_availqty")
    catalog.create_table("partsupp_live", empty, key=["l_partkey", "l_suppkey"])
    stream = (spark.readStream
              .schema("l_orderkey long, l_partkey long, l_suppkey long")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src)))
    q = vm.projection_view_stream(
        stream, catalog, "partsupp_live", ["l_partkey", "l_suppkey"],
        derived, str(tmp_path / "chk"))
    q.awaitTermination(120)
    got = catalog.table("partsupp_live").df
    want = li.selectExpr(
        "l_partkey", "l_suppkey",
        f"{derived['ps_availqty']} AS ps_availqty").dropDuplicates(
        ["l_partkey", "l_suppkey"])
    assert _rows(got) == _rows(want)


def test_agg_merge_never_reads_base_table(spark, tmp_path):
    """The refresh plan's only inputs are the stored view and the batch —
    by construction (agg_merge takes exactly those two DataFrames), checked
    on the plan: one parquet scan (the view version dir), no second."""
    events = _events(spark)
    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    vm.agg_view_create(catalog, "by_type", ["event_type"], ["value"], events)
    batch = spark.createDataFrame(
        [(10_000_001, "click", 1.5)], "event_id long, event_type string, value double")
    merged = vm.agg_merge(
        catalog.table("by_type").df,
        vm.agg_partial(batch, ["event_type"], ["value"]), ["event_type"])
    phys = merged._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Scan parquet") == 1, phys  # the view, nothing else


def test_graph_edge_view_maintained_from_stream(spark, tmp_path):
    """The graph-store composition a real deployment runs: an edge stream
    upserts into a catalog edge table on the composite (src, dst, label)
    key (incremental maintenance of the adjacency view — no re-derivation
    from base tables), and the dual bucketed layout periodically
    re-materializes FROM the maintained table, after which traversals see
    the streamed edges through exchange-free bucketed plans."""
    from hugegraph_on_tikv_spark.operators.traversal import k_hop
    from hugegraph_on_tikv_spark.sources.edge_layout import DualEdgeLayout
    from hugegraph_on_tikv_spark.streaming.ingest import stream_upsert

    # base edges + a later streamed delta that adds a 2-hop path 1→2→99
    base = spark.createDataFrame(
        [(1, 2, "e"), (3, 4, "e")], "src long, dst long, label string")
    delta = spark.createDataFrame(
        [(2, 99, "e"), (1, 2, "e")], "src long, dst long, label string")
    src_dir = tmp_path / "edge_stream"
    base.write.mode("append").parquet(str(src_dir))

    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    catalog.create_table("edges_live", base.limit(0),
                         key=["src", "dst", "label"])
    schema = "src long, dst long, label string"

    def ingest(chk):
        q = stream_upsert(
            spark.readStream.schema(schema).parquet(str(src_dir)),
            catalog, "edges_live", ["src", "dst", "label"], str(tmp_path / chk))
        q.awaitTermination(120)

    ingest("chk1")
    assert catalog.table("edges_live").df.count() == 2

    delta.write.mode("append").parquet(str(src_dir))
    ingest("chk2")  # new checkpoint dir: full replay — upsert is idempotent
    live = catalog.table("edges_live").df
    assert live.count() == 3  # (1,2) replayed, not duplicated

    # compaction step: rebuild the dual layout from the maintained table
    layout = DualEdgeLayout.materialize(
        live, "t_live_edges", str(tmp_path / "dual"), buckets=4)
    try:
        reached = {(r["id"], r["hops"]) for r in k_hop(
            layout.edges("src"), [1], k=2,
            edges_by_dst=layout.edges("dst")).collect()}
        assert reached == {(2, 1), (99, 2)}  # the streamed edge is traversable
        phys = layout.two_hop("out", "out") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in phys  # and the layout is the bucketed one
    finally:
        layout.drop()
