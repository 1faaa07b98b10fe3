"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line.

TWO protocols per run, so every round is comparable with every other:

* shared-cache (the round-1 protocol): queries run back-to-back after one
  session warm-up, sharing whatever cache/JIT state earlier queries built —
  the long-lived-cluster regime.  Reported under "queries_shared_cache".
* isolated (the round-2 protocol, the durable baseline): before each query
  the cache is dropped and a full GC nudged, so each number is a
  cold-cache plan execution paying its own materialization.  Reported under
  "queries" and summed into "value".

"steady_state" additionally reports min-of-2 warm repeats of the iterative
flagship (JIT-dominated cold runs; a long-lived cluster is always warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hugegraph_on_tikv_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline subset: one per operator family — scans, aggregation, join-heavy,
# graph traversal, graph analytics, windows, text/dedup, similarity.
HEADLINERS = [
    "s1_scan_all",
    "a1_count",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "g_degree",
    "g_khop2",
    "win_tumbling",
    "sim_cosine_topk_vectorized",
]

EXTRAS = ["dedup_minhash_lsh", "sim_cosine_topk", "g_pagerank"]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("hugegraph-on-tikv-spark-bench")
    # Session + JIT warm-up: run the iterative join/agg shape once on a toy
    # graph so headline numbers measure steady-state plan execution, not the
    # JVM's first-compilation of the codegen paths (measured ~2x on the
    # iterative queries).  A long-lived cluster is always in this regime.
    spark.range(1).count()
    from pyspark.sql import functions as F  # noqa: WPS433

    from hugegraph_on_tikv_spark.operators.analytics import pagerank

    toy = spark.range(200).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 1) % 200).alias("dst")
    )
    pagerank(toy, iterations=4, checkpoint_every=2).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # bench individual operators from the pre-fusion registry (queries()
    # exports tagged-union fusions sized for the driver's correctness cap;
    # timing those would double-count work)
    qs = entrymod.raw_queries() if hasattr(entrymod, "raw_queries") else entrymod.queries()
    names = [n for n in HEADLINERS if n in qs]
    for extra in EXTRAS:
        if extra in qs and extra not in names:
            names.append(extra)

    def run_plain(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # noop sink: full materialization of every column (a bare count()
        # would let Catalyst prune the scan down to row counting)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_isolated(fn) -> float:
        # drop persisted intermediates (pagerank state, shingle sets,
        # adjacency projections) and nudge a full GC so this query doesn't
        # pay or profit from earlier queries' cache/heap state (stale
        # localCheckpoint blocks are only freed by the ContextCleaner after
        # GC notices they're unreferenced)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return run_plain(fn)

    shared: dict[str, float] = {}
    for name in names:
        shared[name] = run_plain(qs[name])
        print(f"# shared {name}: {shared[name]}s", file=sys.stderr)

    isolated: dict[str, float] = {}
    for name in names:
        isolated[name] = run_isolated(qs[name])
        print(f"# isolated {name}: {isolated[name]}s", file=sys.stderr)

    steady: dict[str, float] = {}
    # steady-state of the iterative flagship: C2 compilation of the join/agg
    # codegen converges over ~3 executions (measured 13.2 → 7.6 → 5.9 →
    # 5.6s at sf0.1); min-of-2 warm repeats is the usual protocol.
    if "g_pagerank" in isolated:
        steady["g_pagerank_warm"] = min(
            run_isolated(qs["g_pagerank"]) for _ in range(2)
        )
        print(f"# steady g_pagerank_warm: {steady['g_pagerank_warm']}s", file=sys.stderr)

    # dual bucketed edge layout (sources/edge_layout.py): time the two-hop
    # mid-join on the bucketed copies vs the identical SMJ on the raw edge
    # view — the bucketed form runs the join with zero exchanges (plan
    # pinned in tests/test_plans.py); this measures what that saves.
    layout_metrics: dict[str, float | str] = {}
    try:
        import shutil
        import tempfile

        from hugegraph_on_tikv_spark.sources.graph import GraphStore

        store = GraphStore(spark, SF_DIR)
        tmp = tempfile.mkdtemp(prefix="bench_dual_edges_")
        t0 = time.perf_counter()
        layout = store.materialize_dual_layout(tmp, buckets=32,
                                               name="bench_dual_edges")
        layout_metrics["materialize_both_copies"] = round(time.perf_counter() - t0, 3)
        try:
            def run_df(df_or_thunk) -> float:
                # iterative operators (pagerank, k_hop) do EAGER work at
                # DataFrame-construction time (localCheckpoint per round),
                # so timing must wrap construction — pass a thunk for those
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
                df.write.format("noop").mode("overwrite").save()
                return round(time.perf_counter() - t0, 3)

            e = store._build_edges()
            plain = (
                e.select(F.col("src").alias("a"), F.col("dst").alias("mid"))
                .hint("merge")
                .join(e.select(F.col("src").alias("mid"), F.col("dst").alias("c")),
                      "mid")
                .select("a", "mid", "c")
            )
            layout_metrics["two_hop_plain_smj"] = run_df(plain)
            layout_metrics["two_hop_bucketed"] = run_df(layout.two_hop("out", "out"))

            # real operators routed through the layout.  pagerank is
            # compared in the broadcast_ranks=False regime on BOTH sides —
            # that's the >2M-vertices cluster path where the by-src copy is
            # supposed to make the per-iteration contribution join
            # co-located (the broadcast default never shuffles the edge
            # side, so the layout can't help it).
            from hugegraph_on_tikv_spark.operators.analytics import pagerank
            from hugegraph_on_tikv_spark.operators.traversal import OUT, k_hop

            start = entrymod._vid("customer", 42)
            layout_metrics["khop2_routed"] = run_df(lambda: k_hop(
                layout.edges("src"), [start], k=2, direction=OUT,
                edges_by_dst=layout.edges("dst")))
            pr = dict(iterations=10, checkpoint_every=2, state_partitions=8,
                      broadcast_ranks=False)
            lbl = F.col("label").isin(["placed", "contains"])
            layout_metrics["pagerank_shuffle_plain"] = run_df(
                lambda: pagerank(e.filter(lbl), **pr))
            layout_metrics["pagerank_shuffle_bucketed"] = run_df(
                lambda: pagerank(layout.edges("src").filter(lbl), **pr))
            for k in ("two_hop_plain_smj", "two_hop_bucketed", "khop2_routed",
                      "pagerank_shuffle_plain", "pagerank_shuffle_bucketed"):
                print(f"# layout {k}: {layout_metrics[k]}s", file=sys.stderr)
        finally:
            layout.drop()
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as ex:  # never let the layout probe sink the bench
        layout_metrics["error"] = str(ex)[:200]

    # round-4 operators, measured OUTSIDE the comparable series (new keys
    # never change "value"/"shared_cache_total" semantics): the Arrow-vs-JVM
    # simhash twins and the as-of join.
    extras: dict[str, float | str] = {}
    try:
        from hugegraph_on_tikv_spark.functions.dedup import simhash_signatures
        from hugegraph_on_tikv_spark.sources.catalog import load_table

        docs = load_table(spark, SF_DIR, "documents")
        extras["simhash_arrow"] = run_isolated(
            lambda s, sf: simhash_signatures(docs))
        extras["simhash_jvm"] = run_isolated(
            lambda s, sf: simhash_signatures(docs, use_arrow=False))
        for name in ("asof_last_view", "contamination", "g_walks", "cm_sketch"):
            if name in qs:
                extras[name] = run_isolated(qs[name])
        for k, v in extras.items():
            print(f"# extra {k}: {v}s", file=sys.stderr)
    except Exception as ex:
        extras["error"] = str(ex)[:200]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_query_total_time",
        "value": round(sum(isolated.values()), 3),
        "unit": "sec",
        "queries": isolated,
        "queries_shared_cache": shared,
        "shared_cache_total": round(sum(shared.values()), 3),
        "steady_state": steady,
        "dual_edge_layout": layout_metrics,
        "extras": extras,
        "protocols": "queries_shared_cache runs FIRST, immediately after "
                     "warm-up — positionally identical to the round-1 series "
                     "(apples-to-apples with BENCH_r01). queries/value: "
                     "cold-cache isolated (clearCache+GC per query, the r02 "
                     "protocol) but measured AFTER the shared pass, i.e. in "
                     "a fully JIT-warm JVM — improvements vs BENCH_r02's "
                     "isolated numbers are partly position, not all plan. "
                     "steady_state: min-of-2 warm repeats of the iterative "
                     "flagship",
        "sf": sf_val,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
