"""Dual bucketed edge layout — the reference's out/in twin adjacency tables
as Spark physical layout.

The reference stores every edge TWICE: an out-edges table keyed
(src, label, dst) and an in-edges table keyed (dst, label, src)
(TikvTables.java:128-149), so adjacency in either direction is a local
prefix scan.  The Spark-native equivalent of "adjacency is local by
construction" is bucketing: persist the edge table twice, bucketed (and
sorted) by `src` in one copy and by `dst` in the other.  A hop join then
finds its build side already hash-distributed on the join key:

* out-hops (`frontier ⋈ edges ON vertex = src`) read the by-src copy —
  the edge side needs NO exchange, only the (small) frontier shuffles;
* in-hops read the by-dst copy — same property on `dst`;
* multi-hop expansion (`e1 ⋈ e2 ON e1.dst = e2.src`) reads the by-dst
  copy for e1 and the by-src copy for e2 — a sort-merge join with ZERO
  exchanges and zero sorts on either side, in both directions.

Storage cost is 2× the edge table, identical to the reference's twin
tables; both copies are written from one logical DataFrame so they cannot
drift.  tests/test_plans.py pins the exchange-free plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.bucketing import write_bucketed

BY_SRC_SUFFIX = "_by_src"
BY_DST_SUFFIX = "_by_dst"


class DualEdgeLayout:
    """Handle to a materialized dual edge layout (two bucketed catalog
    tables).  Use `materialize` to build one, `edges(direction_key)` to get
    the copy whose bucketing matches a join key."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name

    @classmethod
    def materialize(cls, edges: DataFrame, name: str, path: str,
                    buckets: int = 32) -> "DualEdgeLayout":
        """Write BOTH bucketed copies of `edges` (columns must include
        `src` and `dst`).  `name` prefixes the catalog table names; `path`
        holds the parquet.  Idempotent only in the overwrite sense — the
        copies are always rewritten together so they cannot diverge.

        The input is persisted across the two writes: `edges` is typically
        a lazy multi-source union (GraphStore's view derivation), and
        without the cache each copy would re-derive the whole edge view
        from base tables."""
        edges = edges.persist()
        try:
            write_bucketed(edges, f"{name}{BY_SRC_SUFFIX}", f"{path}/by_src",
                           buckets, "src")
            write_bucketed(edges, f"{name}{BY_DST_SUFFIX}", f"{path}/by_dst",
                           buckets, "dst")
        finally:
            edges.unpersist()
        return cls(edges.sparkSession, name)

    def edges(self, order_by: str = "src") -> DataFrame:
        """The copy bucketed on `order_by` ('src' serves out-traversals and
        any join on src; 'dst' serves in-traversals).  Read through the
        catalog — a plain path read would lose the bucket metadata."""
        if order_by == "src":
            return self.spark.table(f"{self.name}{BY_SRC_SUFFIX}")
        if order_by == "dst":
            return self.spark.table(f"{self.name}{BY_DST_SUFFIX}")
        raise ValueError("order_by must be 'src' or 'dst'")

    def adjacency(self, direction: str = "out") -> DataFrame:
        """(vertex, neighbor) view served from the direction-matching copy,
        so the scan arrives hash-distributed on `vertex`:

        * 'out'  → by-src copy, vertex=src;
        * 'in'   → by-dst copy, vertex=dst;
        * 'both' → union of the two, EACH branch bucket-local on vertex
          (the union itself has no single partitioning — a join against it
          will still exchange the union output; per-direction plans don't).
        """
        out = self.edges("src").select(F.col("src").alias("vertex"),
                                       F.col("dst").alias("neighbor"))
        inn = self.edges("dst").select(F.col("dst").alias("vertex"),
                                       F.col("src").alias("neighbor"))
        if direction == "out":
            return out
        if direction == "in":
            return inn
        if direction == "both":
            return out.unionByName(inn)
        raise ValueError("direction must be 'out', 'in' or 'both'")

    def two_hop(self, first: str = "out", second: str = "out") -> DataFrame:
        """Two-hop expansion (a, mid, c) joining the copies so the middle
        join is exchange-free: the first hop's END side comes from the copy
        bucketed on its end column, the second hop's START side from the
        copy bucketed on its start column — both sides of the mid-join are
        pre-bucketed AND pre-sorted on the join key, so the sort-merge join
        needs no exchange and no sort in EITHER direction combination."""
        ends = {"out": ("src", "dst"), "in": ("dst", "src")}
        if first not in ends or second not in ends:
            raise ValueError("hops must be 'out' or 'in'")
        start1, end1 = ends[first]
        start2, end2 = ends[second]
        e1 = self.edges(end1).select(F.col(start1).alias("a"),
                                     F.col(end1).alias("mid"))
        e2 = self.edges(start2).select(F.col(start2).alias("mid"),
                                       F.col(end2).alias("c"))
        return e1.hint("merge").join(e2, "mid").select("a", "mid", "c")

    def drop(self) -> None:
        """Drop both catalog entries (the parquet files remain at `path`)."""
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}{BY_SRC_SUFFIX}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}{BY_DST_SUFFIX}")
