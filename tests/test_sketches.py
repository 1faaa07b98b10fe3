"""Approximate sketches: error-bounded by contract (no SQL oracle — an
engine-equality check would pin sketch internals, not semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions import sketches
from hugegraph_on_tikv_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

# lgK=12 standard error ≈ 1.04/sqrt(4096) ≈ 1.6%; assert a conservative 5%
TOL = 0.05


def test_hll_distinct_within_error_bound(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    est = {r["l_suppkey"]: r["est"] for r in
           sketches.hll_distinct(li, ["l_suppkey"], "l_partkey")
           .select("l_suppkey", sketches.hll_estimate(F.col("sketch")).alias("est"))
           .collect()}
    exact = {r["l_suppkey"]: r["n"] for r in
             li.groupBy("l_suppkey")
             .agg(F.countDistinct("l_partkey").alias("n")).collect()}
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, TOL * n), (k, est[k], n)


def test_hll_rollup_merges_without_raw_values(spark):
    """Per-(suppkey) sketches roll up to a global sketch whose estimate
    matches the global exact distinct — the mergeability contract."""
    li = load_table(spark, SF_DIR, "lineitem")
    per_key = sketches.hll_distinct(li, ["l_suppkey"], "l_partkey")
    total_est = sketches.hll_merge_rows(
        per_key.withColumn("g", F.lit(1)), ["g"]) \
        .select(sketches.hll_estimate(F.col("sketch")).alias("est")) \
        .collect()[0]["est"]
    total_exact = li.select("l_partkey").distinct().count()
    assert abs(total_est - total_exact) <= max(2, TOL * total_exact)


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    probs = [0.1, 0.5, 0.9]
    got = sketches.approx_quantiles(li, "l_extendedprice", probs).collect()[0]["quantiles"]
    n = li.count()
    vals = [r["l_extendedprice"] for r in
            li.select("l_extendedprice").orderBy("l_extendedprice").collect()]
    for p, q in zip(probs, got):
        # rank of the returned value must sit within a small multiple of
        # 1/accuracy of p (the GK summary's bound is per-merge; observed
        # ~2e-4 at this size, asserted at 5e-4)
        import bisect

        lo = bisect.bisect_left(vals, q) / n
        hi = bisect.bisect_right(vals, q) / n
        assert lo - 5e-4 <= p <= hi + 5e-4, (p, q, lo, hi)


def test_count_min_one_sided_and_mergeable(spark):
    """est >= true always; overshoot bounded by n/width; merge of halves is
    BIT-EXACTLY the sketch of the whole (counters are plain sums)."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_suppkey").alias("v"))
    sk = sketches.count_min_sketch(li, "v")
    est = {r["v"]: r["est"] for r in
           sketches.count_min_estimate(sk, li, "v").collect()}
    true = {r["v"]: r["n"] for r in
            li.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = li.count()
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)             # one-sided
        assert est[v] - t <= 3 * n / sketches.CM_WIDTH  # crude cap on overshoot
    # never-seen value estimates (near) zero-overshoot
    unseen = spark.createDataFrame([("no-such-value-xyz",)], "v string")
    u = sketches.count_min_estimate(sk, unseen, "v").collect()[0]["est"]
    assert u <= 3 * n / sketches.CM_WIDTH
    # exact mergeability
    h1 = sketches.count_min_sketch(li.filter(F.col("v") % 2 == 0), "v")
    h2 = sketches.count_min_sketch(li.filter(F.col("v") % 2 == 1), "v")
    merged = {(r["d"], r["w"]): r["c"] for r in
              sketches.count_min_merge(h1, h2).collect()}
    whole = {(r["d"], r["w"]): r["c"] for r in sk.collect()}
    assert merged == whole


def test_heavy_hitters_exact_vs_groupby(spark):
    """heavy_hitters is EXACT by construction: MG only bounds the candidate
    set, the superset guarantee makes the threshold filter lossless."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.functions.sketches import heavy_hitters
    from hugegraph_on_tikv_spark.functions.text import tokens
    from hugegraph_on_tikv_spark.sources.catalog import load_table

    tok = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        F.explode(tokens(F.col("text"))).alias("token"))
    got = {(r["value"], r["n_occurrences"])
           for r in heavy_hitters(tok, "token", 0.01).collect()}
    n = tok.count()
    import math

    support = math.ceil(0.01 * n)
    want = {(r["token"], r["cnt"])
            for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= support).collect()}
    assert got == want and len(want) > 0


def test_heavy_hitters_order_and_partitioning_invariant(spark):
    """MG's internal order sensitivity must not leak: an adversarial layout
    (hot values clustered at the end of each partition, many partitions)
    yields the identical exact answer."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.functions.sketches import heavy_hitters

    # 10k rows: values 'hot_0'..'hot_4' hold 10% each, 5000 singletons tail
    rows = [(f"u{i}",) for i in range(5000)] + \
           [(f"hot_{i % 5}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "v string")
    expected = {(f"hot_{i}", 1000) for i in range(5)}
    for arrangement in (df.repartition(17), df.orderBy("v"),
                        df.orderBy(F.col("v").desc()).repartition(3)):
        got = {(r["value"], r["n_occurrences"])
               for r in heavy_hitters(arrangement, "v", 0.05).collect()}
        assert got == expected


def test_misra_gries_candidates_superset_and_bounded(spark):
    from hugegraph_on_tikv_spark.functions.sketches import misra_gries_candidates

    rows = [("hot",)] * 400 + [(f"u{i}",) for i in range(600)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    cands = {r["value"] for r in misra_gries_candidates(df, "v", 10).collect()}
    assert "hot" in cands                  # 40% >> 1/11 per partition
    assert len(cands) <= 10 * 4            # <= k per partition
