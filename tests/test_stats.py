"""Optimizer statistics (functions/stats.py): exact join cardinality,
deterministic KMV join-size estimation, FK containment."""

from __future__ import annotations

import pytest

from hugegraph_on_tikv_spark.functions import stats


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.createDataFrame(
        [(k, i) for i, k in enumerate([1, 1, 1, 2, 2, 3, 5, None])],
        "k long, payload long")
    b = spark.createDataFrame(
        [(k, i) for i, k in enumerate([1, 2, 2, 2, 4, None])],
        "k long, payload long")
    return a, b


def test_join_size_exact_matches_real_join(spark, tables):
    a, b = tables
    row = stats.join_size_exact(a, b, "k").collect()[0]
    true = a.join(b, "k").count()           # NULLs never join
    assert row.join_rows == true == 3 * 1 + 2 * 3
    assert (row.n_keys_a, row.n_keys_b, row.n_keys_both) == (4, 3, 2)


def test_join_size_exact_disjoint_keys(spark):
    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(9,)], "k long")
    row = stats.join_size_exact(a, b, "k").collect()[0]
    assert row.join_rows == 0 and row.n_keys_both == 0


def test_kmv_is_exact_when_k_covers_domain(spark, tables):
    """With k >= |key domain| the 'sample' is the whole domain and the
    scaled estimate equals the exact join size exactly."""
    a, b = tables
    exact = stats.join_size_exact(a, b, "k").collect()[0].join_rows
    row = stats.join_size_kmv(a, b, "k", k=1000).collect()[0]
    assert row.sampled_product == exact
    assert row.estimate_scaled == exact * 1_000_000   # fraction = 1


def test_kmv_deterministic_and_bounded_error(spark):
    """md5 ranks make the estimate a pure function of the data: two runs
    agree bit-for-bit; with k = domain/4 the estimate lands within 50%
    on a uniform self-join (loose band — this pins sanity, the driver
    pins exactness)."""
    rows = [(i % 500, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, payload long")
    r1 = stats.join_size_kmv(df, df, "k", k=125).collect()[0]
    r2 = stats.join_size_kmv(df, df, "k", k=125).collect()[0]
    assert r1 == r2
    exact = stats.join_size_exact(df, df, "k").collect()[0].join_rows
    est = r1.estimate_scaled / 1_000_000
    assert 0.5 * exact < est < 1.5 * exact
    assert r1.n_sampled == 125


def test_key_containment_fk_discovery(spark, tables):
    a, b = tables
    row = stats.key_containment(a, b, "k").collect()[0]
    # A keys {1,2,3,5}; B keys {1,2,4} -> 2 of 4 resolve
    assert (row.n_keys_a, row.n_contained) == (4, 2)
    assert row.containment == pytest.approx(0.5)
    full = stats.key_containment(b.filter("k IN (1, 2)"), a, "k").collect()[0]
    assert full.containment == 1.0


def test_skew_report_flags_hub_and_recommends_salt(spark):
    rows = ([("hub", i) for i in range(900)]
            + [(f"k{i}", i) for i in range(100)])
    df = spark.createDataFrame(rows, "k string, payload long")
    out = {(r.tag, r.key_str): r
           for r in stats.skew_report(df, "k", top=3,
                                      shuffle_partitions=10).collect()}
    hub = out[("hot", "hub")]
    assert hub.n_rows == 900
    assert hub.share_ppm == (900 * 1_000_000) // 1000
    # ideal partition = 100 rows -> the hub needs 9-way salting
    assert hub.salt_factor == 9
    summary = next(v for (t, _), v in out.items() if t == "summary")
    assert summary.key_str == "101" and summary.n_rows == 1000
    assert summary.salt_factor == 9
    # uniform keys need no salting
    uni = [v for (t, k), v in out.items() if t == "hot" and k != "hub"]
    assert all(v.salt_factor == 1 for v in uni)


def test_skew_report_uniform_table_is_quiet(spark):
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(500)],
                               "k string")
    out = stats.skew_report(df, "k", top=5, shuffle_partitions=10).collect()
    assert all(r.salt_factor == 1 for r in out)
