"""Deterministic corpus sampling: hash-driven splits, Bernoulli-by-hash
sampling, per-group caps — reproducibility is the contract under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions import sampling
from hugegraph_on_tikv_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_split_assign_partitions_and_reproduces(spark):
    docs = _docs(spark)
    out = sampling.split_assign(docs, WEIGHTS)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # every row in exactly one split
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # byte-for-byte reproducible
    again = {r["doc_id"]: r["split"]
             for r in sampling.split_assign(docs, WEIGHTS).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again
    # id-pure: assigning a SUBSET yields the same split per row (append
    # stability — new data never moves old rows between splits)
    sub = {r["doc_id"]: r["split"]
           for r in sampling.split_assign(
               docs.filter(F.col("doc_id") % 7 == 0), WEIGHTS).collect()}
    assert all(first[k] == v for k, v in sub.items())
    with pytest.raises(ValueError):
        sampling.split_assign(docs, {"a": 0.5, "b": 0.2})


def test_split_sql_is_exact_twin(spark):
    """The oracle builder reproduces split_assign bit-for-bit in DuckDB."""
    import duckdb

    docs = _docs(spark)
    got = {r["doc_id"]: r["split"]
           for r in sampling.split_assign(docs, WEIGHTS).collect()}
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT doc_id, {sampling.split_sql(WEIGHTS)} AS split "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')").fetchall())
    assert got == want


def test_stratified_sample_deterministic_and_salted(spark):
    docs = _docs(spark)
    s1 = {r["doc_id"] for r in sampling.stratified_sample(docs, 0.2).collect()}
    s2 = {r["doc_id"] for r in sampling.stratified_sample(docs, 0.2).collect()}
    assert s1 == s2 and 0 < len(s1) < docs.count()
    # a fraction superset keeps every row of the smaller fraction (nested
    # samples — the property that lets you grow a sample without resampling)
    s3 = {r["doc_id"] for r in sampling.stratified_sample(docs, 0.5).collect()}
    assert s1 <= s3
    # different salt = a different (independent) draw
    s4 = {r["doc_id"] for r in
          sampling.stratified_sample(docs, 0.2, salt="v2").collect()}
    assert s4 != s1
    with pytest.raises(ValueError):
        sampling.stratified_sample(docs, 1.5)


def test_cap_per_group_caps_and_reproduces(spark):
    docs = _docs(spark)
    capped = sampling.cap_per_group(docs, "source", 10)
    per = capped.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    assert per.filter(F.col("n") > 10).count() == 0
    # groups under the cap are untouched
    orig = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["n"] for r in per.collect()}
    for src, n in orig.items():
        assert got[src] == min(n, 10)
    # deterministic kept set, schema unchanged
    a = {r["doc_id"] for r in capped.collect()}
    b = {r["doc_id"] for r in sampling.cap_per_group(docs, "source", 10).collect()}
    assert a == b
    assert capped.columns == docs.columns


def test_sampling_plan_shapes(spark):
    """stratified_sample compiles to a filtered scan (zero exchanges);
    cap_per_group's rank filter becomes a WindowGroupLimit so hot groups
    are cut to `cap` rows before the full sort materializes."""
    docs = _docs(spark)
    phys = sampling.stratified_sample(docs, 0.1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys, phys
    phys_cap = sampling.cap_per_group(docs, "source", 10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in phys_cap, phys_cap


def test_weighted_sample_rate_tracks_weight(spark):
    """Keep-rate per weight tier ≈ the weight; weight 0 keeps nothing,
    weight 1 keeps everything; deterministic; and re-weighting leaves the
    draw itself fixed (rows keep their bucket — only thresholds move)."""
    docs = _docs(spark).withColumn(
        "w", (F.col("doc_id") % 4) / F.lit(4.0))  # tiers 0, .25, .5, .75
    kept = sampling.weighted_sample(docs, "w")
    n_tier = {r["w"]: r["n"] for r in docs.groupBy("w").count()
              .withColumnRenamed("count", "n").collect()}
    k_tier = {r["w"]: r["n"] for r in kept.groupBy("w").count()
              .withColumnRenamed("count", "n").collect()}
    assert 0.0 not in k_tier                      # weight 0: nothing kept
    for w, n in n_tier.items():
        if w > 0:
            rate = k_tier.get(w, 0) / n
            assert abs(rate - w) < 0.25, (w, rate)  # tracks the weight
    ones = docs.withColumn("w", F.lit(1.0))
    assert sampling.weighted_sample(ones, "w").count() == docs.count()
    # determinism + draw-independence from weights: a kept row stays kept
    # when its weight only increases
    bumped = docs.withColumn("w", F.least(F.col("w") + 0.25, F.lit(1.0)))
    kept_ids = {r["doc_id"] for r in kept.collect()}
    bumped_ids = {r["doc_id"] for r in
                  sampling.weighted_sample(bumped, "w").collect()}
    assert kept_ids <= bumped_ids


def test_cluster_safe_split_keeps_clusters_together(spark):
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.functions.sampling import (cluster_safe_split,
                                                            split_assign)

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string")
    # two clusters: {0,1,2} and {10,11}; the rest singleton
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")
    out = cluster_safe_split(
        docs, {"train": 0.6, "val": 0.2, "test": 0.2}, clusters)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 40
    # all members of a cluster share the split
    assert len({rows[i]["split"] for i in (0, 1, 2)}) == 1
    assert len({rows[i]["split"] for i in (10, 11)}) == 1
    # singletons match plain split_assign (append-stability preserved)
    plain = {r["doc_id"]: r["split"] for r in split_assign(
        docs, {"train": 0.6, "val": 0.2, "test": 0.2}).collect()}
    for i in range(12, 40):
        assert rows[i]["split"] == plain[i]
        assert rows[i]["cluster_id"] is None


def test_mix_corpus_proportions_prefix_and_undersupply(spark):
    docs = _docs(spark)  # 20 sources x 25 docs at sf0.001? (sizes vary by SF)
    per_source = {r["source"]: r["n"] for r in
                  docs.groupBy("source").agg(
                      F.count(F.lit(1)).alias("n")).collect()}
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    total = 20
    out = sampling.mix_corpus(docs, "source", weights, total)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    # caps honored exactly where supply allows; undersupplied domains give
    # everything they have, never back-filled from elsewhere
    for d, w in weights.items():
        cap = round(total * w)
        assert counts.get(d, 0) == min(cap, per_source.get(d, 0))
    assert set(counts) <= set(weights)  # unlisted domains dropped

    # prefix property: a smaller mixture is a subset of a larger one
    small = {r["doc_id"] for r in
             sampling.mix_corpus(docs, "source", weights, 10).collect()}
    large = {r["doc_id"] for r in out.collect()}
    assert small <= large

    # reproducible; salted remix differs
    again = {r["doc_id"] for r in
             sampling.mix_corpus(docs, "source", weights, total).collect()}
    assert again == large
    salted = {r["doc_id"] for r in
              sampling.mix_corpus(docs, "source", weights, total,
                                  salt="v2").collect()}
    assert salted != large


def test_mix_corpus_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        sampling.mix_corpus(docs, "source", {}, 10)
    with pytest.raises(ValueError):
        sampling.mix_corpus(docs, "source", {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        sampling.mix_corpus(docs, "source", {"a": -1.0}, 10)


def test_temperature_mix_flattens_skew(spark):
    """alpha=0.5 pulls domain shares toward uniform: a 100:25:4 corpus
    (isqrt weights 10:5:2) mixes at caps floor(34*w/17) = 20:10:4, flatter
    than natural (~26:6:1 at total 34) but not uniform."""
    from hugegraph_on_tikv_spark.functions.sampling import temperature_mix

    rows = ([(i, "a") for i in range(100)]
            + [(1000 + i, "b") for i in range(25)]
            + [(2000 + i, "c") for i in range(4)])
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    got = temperature_mix(df, "domain", total=34).groupBy("domain").count()
    counts = {r["domain"]: r["count"] for r in got.collect()}
    assert counts == {"a": 20, "b": 10, "c": 4}


def test_temperature_mix_alpha_validation_and_stability(spark):
    import pytest

    from hugegraph_on_tikv_spark.functions.sampling import temperature_mix

    rows = [(i, "a" if i % 3 else "b") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    with pytest.raises(ValueError):
        temperature_mix(df, "domain", total=10, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_mix(df, "domain", total=0)
    # same inputs -> identical kept set (hash-order determinism)
    k1 = sorted(r["doc_id"] for r in
                temperature_mix(df, "domain", total=10).collect())
    k2 = sorted(r["doc_id"] for r in
                temperature_mix(df.repartition(7), "domain",
                                total=10).collect())
    assert k1 == k2 and len(k1) > 0


def test_hash_stage_salt_correlation_pitfall(spark):
    """Chained hash-driven stages MUST use distinct salts: a mix followed
    by a same-salt 80/10/10 split puts every kept doc in 'train' (the mix
    keeps exactly the smallest-bucket prefix), while a distinct-salt
    split is balanced.  Pins the composition warning in temperature_mix's
    docstring (found live by the pipe_curate_v4 driver row)."""
    from hugegraph_on_tikv_spark.functions.sampling import (
        split_assign, temperature_mix)

    rows = [(i, "d") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    mixed = temperature_mix(df, "domain", total=40)   # salt "" — 40 kept
    same = split_assign(mixed, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in
              same.groupBy("split").count().collect()}
    assert counts == {"train": 40}                    # the pitfall, pinned
    decor = split_assign(mixed, {"train": 0.8, "val": 0.1, "test": 0.1},
                         salt="other")
    counts2 = {r["split"]: r["count"] for r in
               decor.groupBy("split").count().collect()}
    assert len(counts2) >= 2 and counts2.get("train", 0) < 40


def test_training_order_is_dense_permutation(spark):
    docs = _docs(spark).select("doc_id")
    n = docs.count()
    ordr = sampling.training_order(docs, n_shards=8, salt="epoch0")
    rows = ordr.collect()
    assert len(rows) == n
    # block order: dense 0..n-1
    assert sorted(r["block_pos"] for r in rows) == list(range(n))
    # read order: strict total order (collision-free) respecting shards
    reads = [r["read_pos"] for r in rows]
    assert len(set(reads)) == n
    for r in rows:
        assert r["read_pos"] % 8 == r["shard"]
        assert r["read_pos"] // 8 == r["pos"]
    # reproducible; a different salt is a different permutation
    again = {r["doc_id"]: r["block_pos"]
             for r in sampling.training_order(docs, 8, "epoch0").collect()}
    assert again == {r["doc_id"]: r["block_pos"] for r in rows}
    other = {r["doc_id"]: r["block_pos"]
             for r in sampling.training_order(docs, 8, "epoch1").collect()}
    assert other != again


def test_token_budget_select_matches_greedy_reference(spark):
    docs = [(i, (i * 37) % 101, 5 + (i * 13) % 40) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, q long, toks long")
    budget = 1500
    kept = sampling.token_budget_select(
        df, budget=budget, quality_col="q", token_col="toks",
        id_col="doc_id", band_width=10)
    got = {r["id"]: (r["quality"], r["tokens"], r["spent"])
           for r in kept.collect()}
    # brute-force greedy prefix over (q DESC, id ASC)
    spent, want = 0, {}
    for i, q, t in sorted(docs, key=lambda d: (-d[1], d[0])):
        if spent + t > budget:
            break
        spent += t
        want[i] = (q, t, spent)
    assert got == want
    assert max(s for _, _, s in got.values()) <= budget


def test_token_budget_whole_corpus_when_budget_covers_it(spark):
    df = spark.createDataFrame([(1, 5, 10), (2, 3, 10), (3, 9, 10)],
                               "doc_id long, q long, toks long")
    kept = sampling.token_budget_select(df, budget=100, quality_col="q",
                                        token_col="toks", id_col="doc_id",
                                        band_width=2)
    assert kept.count() == 3


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def _dsir_pool(spark, n_target_like=30, n_other=70):
    """Pool where docs 0..29 share the target's vocabulary and the rest
    speak a disjoint one — importance weights should separate them."""
    rows = []
    for i in range(n_target_like):
        rows.append((i, f"alpha beta gamma delta alpha beta epsilon w{i % 5}"))
    for i in range(n_target_like, n_target_like + n_other):
        rows.append((i, f"zeta eta theta iota kappa zeta eta x{i % 7}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_select_prefers_target_distribution(spark):
    pool = _dsir_pool(spark)
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon alpha beta") for i in range(8)],
        "doc_id long, text string")
    kept = sampling.dsir_select(pool, target, n=25).collect()
    assert len(kept) == 25
    # Gumbel noise may admit a few off-distribution docs; the bulk must be
    # target-like, and every target-like doc must outweigh every other doc
    n_like = sum(1 for r in kept if r["doc_id"] < 30)
    assert n_like >= 20
    w = {r["doc_id"]: r["logw_scaled"]
         for r in sampling.dsir_select(pool, target, n=100).collect()}
    assert min(w[i] for i in range(30)) > max(w[i] for i in range(30, 100))


def test_dsir_weights_match_python_reference(spark):
    """Pin the exact-integer weight formula (floored log-probs, hashed
    buckets) against an independent Python replay — catches any drift in
    Spark's ln/floor path the oracle relies on."""
    import hashlib
    import math
    import re

    B, k, SCALE, salt = 512, 1, sampling.DSIR_SCALE, "dsir"
    pool_rows = [(1, "the cat sat"), (2, "dogs bark loud"), (3, "the cat")]
    target_rows = [(10, "the cat purred")]

    def grams(text):
        t = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(f"{salt}|{g}".encode()).hexdigest()[:15], 16) % B

    def counts(rows):
        c = {}
        for _, text in rows:
            for g in grams(text):
                b = bucket(g)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cs = counts(target_rows), counts(pool_rows)
    tt, ts = sum(ct.values()), sum(cs.values())

    def lp(cnt, tot):
        return math.floor(math.log((cnt + k) / (tot + k * B)) * SCALE)

    expect = {}
    for did, text in pool_rows:
        expect[did] = sum(lp(ct.get(bucket(g), 0), tt) - lp(cs.get(bucket(g), 0), ts)
                          for g in grams(text))

    pool = spark.createDataFrame(pool_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    got = {r["doc_id"]: r["logw_scaled"]
           for r in sampling.dsir_select(pool, target, n=3,
                                         n_buckets=B).collect()}
    assert got == expect


def test_dsir_gumbel_salt_and_validation(spark):
    pool = _dsir_pool(spark)
    target = pool.filter(F.col("doc_id") < 30)
    a = sampling.dsir_select(pool, target, n=40, salt="s1").collect()
    b = sampling.dsir_select(pool, target, n=40, salt="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    c = sampling.dsir_select(pool, target, n=40, salt="s2").collect()
    assert ({r["doc_id"] for r in a} != {r["doc_id"] for r in c}
            or sorted(r["gumbel_scaled"] for r in a)
            != sorted(r["gumbel_scaled"] for r in c))  # salt moves the noise
    # explicit source == default source when they are the same frame
    d = sampling.dsir_select(pool, target, n=40, source=pool, salt="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, d))
    with pytest.raises(ValueError):
        sampling.dsir_select(pool, target, n=0)
    with pytest.raises(ValueError):
        sampling.dsir_select(pool, target, n=5, n_buckets=1)
