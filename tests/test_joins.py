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
