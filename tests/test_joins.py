"""Skew-handling join strategies: result equivalence with plain joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.operators.joins import (
    broadcast_semi_filter,
    range_bucket_join,
    salted_join,
)
from hugegraph_on_tikv_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    # skewed fact: every lineitem of a hot order joins the orders dim
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", salt=4)
    assert _multiset(salted) == _multiset(plain)


def test_salted_left_join(spark):
    li = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    dim = spark.createDataFrame([(1, "X"), (2, "Y")], "k long, w string")
    out = salted_join(li, dim, "k", salt=3, how="left")
    got = {(r["k"], r["w"]) for r in out.collect()}
    assert got == {(1, "X"), (2, "Y"), (99, None)}


def test_broadcast_semi_filter(spark):
    c = load_table(spark, SF_DIR, "customer")
    keys = spark.createDataFrame([(1,), (2,), (999999,)], "c_custkey long")
    out = broadcast_semi_filter(c, keys, "c_custkey")
    assert {r["c_custkey"] for r in out.collect()} == {1, 2}


def test_range_bucket_join_assignment(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (2.5,), (9.0,)], "v double")
    out = range_bucket_join(df, [1.0, 2.0, 3.0], "v")
    got = {(r["v"], r["bucket"]) for r in out.collect()}
    assert got == {(0.5, 0), (1.5, 1), (2.5, 2), (9.0, 3)}


def test_salted_join_skips_map_columns(spark):
    """MapType columns can't be hashed for the salt; they are excluded and
    the join still matches the plain join."""
    from pyspark.sql import functions as F

    large = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k int, v string"
    ).withColumn("m", F.create_map(F.lit("x"), F.col("v")))
    small = spark.createDataFrame([(1, 10), (2, 20)], "k int, w int")
    got = salted_join(large, small, "k", salt=4)
    plain = large.join(small, "k")
    assert sorted((r["k"], r["v"], r["w"]) for r in got.collect()) == \
        sorted((r["k"], r["v"], r["w"]) for r in plain.collect())


def test_asof_join_semantics(spark):
    """As-of join: latest right row at-or-before each left time, per key —
    inclusive at equal instants, inner on unmatched, tolerance-bounded."""
    from hugegraph_on_tikv_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 9, "b"), (1, 4, "pre"), (2, 3, "c"), (2, 9, "d")],
        "k long, t long, v string")
    right = spark.createDataFrame(
        [(1, 4, 10.0), (1, 6, 20.0), (2, 9, 30.0)],
        "k long, t long, p double")
    got = {(r["k"], r["t"]): (r["t_right"], r["p_right"])
           for r in asof_join(left, right, "k", "t", ["p"]).collect()}
    assert got == {
        (1, 4): (4, 10.0),   # equal instant: right row visible (inclusive)
        (1, 5): (4, 10.0),
        (1, 9): (6, 20.0),   # latest of the two priors
        (2, 9): (9, 30.0),
    }  # (2, 3) dropped: no right row at-or-before (inner semantics)

    # tolerance: (1, 9) only matches within 2 ticks -> 6 < 9-2 drops it
    tol = {(r["k"], r["t"]) for r in
           asof_join(left, right, "k", "t", ["p"], tolerance_expr="2").collect()}
    assert tol == {(1, 4), (1, 5), (2, 9)}

    # agrees with DuckDB's native ASOF JOIN on the same data
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, t BIGINT, v VARCHAR)")
    con.execute("INSERT INTO l VALUES (1,5,'a'),(1,9,'b'),(1,4,'pre'),(2,3,'c'),(2,9,'d')")
    con.execute("CREATE TABLE r(k BIGINT, t BIGINT, p DOUBLE)")
    con.execute("INSERT INTO r VALUES (1,4,10.0),(1,6,20.0),(2,9,30.0)")
    want = {(k, t): (rt, p) for k, t, rt, p in con.execute(
        "SELECT l.k, l.t, r.t, r.p FROM l ASOF JOIN r "
        "ON l.k = r.k AND l.t >= r.t").fetchall()}
    assert got == want


def test_asof_join_one_shuffle(spark):
    """The as-of plan shuffles once on the key (union -> window), never
    per-row Python."""
    from hugegraph_on_tikv_spark.operators.joins import asof_join

    left = spark.range(100).selectExpr("id % 5 AS k", "id AS t", "id AS v")
    right = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS t", "id AS p")
    phys = asof_join(left, right, "k", "t", ["p"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1, phys
    assert "Python" not in phys, phys


def test_interval_overlap_join_matches_bruteforce(spark):
    import random

    from hugegraph_on_tikv_spark.operators.joins import interval_overlap_join

    rng = random.Random(13)
    for w in (1, 5, 32):
        lrows = [(rng.randint(0, 2), i, rng.randint(-40, 60))
                 for i in range(60)]
        lrows = [(k, i, s, s + rng.randint(0, 25)) for k, i, s in lrows]
        rrows = [(rng.randint(0, 2), 100 + i, rng.randint(-40, 60))
                 for i in range(60)]
        rrows = [(k, i, s, s + rng.randint(0, 25)) for k, i, s in rrows]
        left = spark.createDataFrame(
            lrows, "k long, lid long, ls long, le long")
        right = spark.createDataFrame(
            rrows, "k long, rid long, rs long, re long")
        got = sorted(
            (r.k, r.lid, r.rid) for r in interval_overlap_join(
                left, right, "ls", "le", "rs", "re",
                on=["k"], bucket_width=w).collect())
        want = sorted(
            (lk, lid, rid)
            for lk, lid, ls, le in lrows
            for rk, rid, rs, re in rrows
            if lk == rk and ls <= re and rs <= le)
        assert got == want, f"bucket_width={w}"


def test_interval_overlap_join_touching_and_no_key(spark):
    from hugegraph_on_tikv_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 10)], "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(1, 10, 20), (2, 11, 20)], "rid long, rs long, re long")
    got = sorted(r.rid for r in interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=4).collect())
    assert got == [1]  # closed intervals: touching at 10 matches, 11 not
    import pytest as _pytest
    with _pytest.raises(ValueError):
        interval_overlap_join(left, right, "ls", "le", "rs", "re",
                              bucket_width=0)
