"""One-shot sf1-scale SKEWED-graph datapoint (VERDICT r10 #3).

GRAPH_SF1's multiplicative-ring graph is degree-uniform, so the repo's
hub defenses — greedy_coloring's broadcast-under-guard pick joins,
cc_star's degree-oriented machinery, louvain's min_by argmax proposals,
pagerank's skew posture — are never actually exercised at sf1.  This
probe builds a DETERMINISTIC power-law graph and times the same loop
machinery on it:

* Data: preferential attachment via the classic inverse-square trick —
  vertex i (1..n-1) attaches K edges to targets t = floor(i * u^2) with
  u an md5-derived uniform in [0, 1) per (i, k).  P(t = j) ~ 1/sqrt(i*j)
  gives in-degree ~ i^-0.5 tails (power-law exponent 3, the Barabasi
  regime); vertex 0's degree lands around 2K*sqrt(n) (~8k at n=1M, K=4)
  — a real hub, orders of magnitude above the median degree of ~2K.
  Everything is column arithmetic over md5 (engine-portable,
  replayable); BENCH-ONLY — correctness queries never touch synthetic
  inputs.
* Ops: greedy_coloring and connected_components_star (to compare against
  their ring-graph GRAPH_SF1 twins), plus louvain_full and pagerank —
  the two operators whose hub defenses (argmax proposals, broadcast
  guards) only a skewed degree distribution can stress.
* Each op runs once end-to-end (multi-round actions; round counts
  dominate dispersion), max in-degree and the twin drift certificate
  ride the artifact.

Writes GRAPH_SF1_SKEW.json at the repo root; bench.py embeds it into
BENCH_FULL.json under "graph_sf1_skew" when present.

Run ALONE on an idle box:  python tools/graph_sf1_skew.py
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_VERTICES = 1_000_000
K_EDGES = 4          # attachment edges per vertex ≈ 4M directed edges


def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from hugegraph_on_tikv_spark.functions.hashing import md5_long
    from hugegraph_on_tikv_spark.operators.analytics import (
        connected_components_star,
        greedy_coloring,
        louvain_full,
        maximal_independent_set,
        pagerank,
        spanning_forest,
    )
    from hugegraph_on_tikv_spark.session import get_spark

    spark = get_spark("graph-sf1-skew-probe")
    spark.range(1).count()

    def twin_pass(tag: str) -> dict[str, float]:
        out = {}
        for pname, pfn in bench._TWIN_PROBES.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            pfn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[pname] = round(time.perf_counter() - t0, 3)
            print(f"# twin[{tag}] {pname}: {out[pname]}s", file=sys.stderr)
        return out

    def twin_median(tag: str) -> dict[str, float]:
        ps = [twin_pass(tag) for _ in range(3)]
        return {k: round(statistics.median([p[k] for p in ps]), 3)
                for k in ps[0]}

    for _ in range(2):                        # throwaway: JIT warm-up
        for pfn in bench._TWIN_PROBES.values():
            pfn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    twins = {"before": twin_median("before")}

    # preferential attachment: t = floor(i * u^2), u = md5(i:k)/2^20-ish
    base = spark.range(1, N_VERTICES).select(F.col("id").alias("src"))
    legs = []
    for k in range(K_EDGES):
        u = (md5_long(F.concat_ws(":", F.col("src"), F.lit(k)))
             % 1_048_576) / 1_048_576.0
        legs.append(base.select(
            "src",
            F.floor(F.col("src") * u * u).cast("long").alias("dst")))
    edges = legs[0]
    for leg in legs[1:]:
        edges = edges.unionByName(leg)
    edges = edges.filter(F.col("src") != F.col("dst")) \
        .localCheckpoint(eager=True)
    n_edges = edges.count()
    deg_row = (edges.select(F.col("dst").alias("id"))
               .groupBy("id").agg(F.count(F.lit(1)).alias("d"))
               .agg(F.max("d").alias("mx"),
                    F.expr("percentile_approx(d, 0.5)").alias("med"))
               .collect()[0])
    u_, v_ = F.least("src", "dst"), F.greatest("src", "dst")
    doc: dict = {
        "n_vertices": N_VERTICES,
        "k_edges_per_vertex": K_EDGES,
        "n_directed_edges": n_edges,
        "max_in_degree": int(deg_row["mx"]),
        "median_in_degree": int(deg_row["med"]),
        "note": ("bench-only deterministic preferential-attachment graph "
                 "(t = floor(i*u^2), u md5-derived); correctness inputs "
                 "are untouched"),
    }
    print(f"# graph: {n_edges} edges, max in-deg {doc['max_in_degree']}, "
          f"median {doc['median_in_degree']}", file=sys.stderr)

    def timed(tag, fn):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn()
        doc[f"{tag}_sec"] = round(time.perf_counter() - t0, 3)
        doc[f"{tag}_rows"] = n
        print(f"# {tag}: {doc[f'{tag}_sec']}s rows={n}", file=sys.stderr)

    # r11: forest + MIS on the skewed graph — Boruvka's per-component
    # root broadcast guard and the min_by pick aggregation only see hub
    # pressure here (a hub's edges all land in one component's pick
    # group); weights md5-derived like the ring twin
    weighted = edges.select(
        "src", "dst",
        (md5_long(F.concat_ws(":", u_, v_)) % 1_000_000)
        .cast("double").alias("weight"))
    timed("spanning_forest",
          lambda: spanning_forest(weighted, max_rounds=20).count())
    timed("mis", lambda: maximal_independent_set(edges).count())
    timed("coloring", lambda: greedy_coloring(edges, max_rounds=80).count())
    timed("cc_star", lambda: connected_components_star(edges).count())
    timed("pagerank", lambda: pagerank(edges, iterations=10,
                                       checkpoint_every=2).count())
    timed("louvain", lambda: louvain_full(edges, level1_rounds=3,
                                          level2_rounds=2).count())

    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(15)
    twin_pass("settle")              # throwaway: post-workload catchup
    twins["after"] = twin_median("after")
    cal = {}
    if os.path.exists(bench.TWIN_FILE):
        with open(bench.TWIN_FILE) as f:
            cal_doc = json.load(f)
        if cal_doc.get("sf_dir") == SF_DIR:
            cal = cal_doc.get("medians", {})
    drift = False
    ratios = {}
    for tag, tp in twins.items():
        for pname, val in tp.items():
            if pname in cal and cal[pname]:
                r = round(val / cal[pname], 3)
                ratios[f"{tag}.{pname}"] = r
                if not (0.7 <= r <= 1 / 0.7):
                    drift = True
    doc.update({
        "twin_runs": twins,
        "twin_ratios_vs_calibration": ratios,
        "reference_drift": drift,
    })

    out_path = os.path.join(REPO, "GRAPH_SF1_SKEW.json")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({k: doc.get(k) for k in (
        "n_directed_edges", "max_in_degree", "spanning_forest_sec",
        "mis_sec", "coloring_sec", "cc_star_sec",
        "pagerank_sec", "louvain_sec", "reference_drift")}))


if __name__ == "__main__":
    main()
