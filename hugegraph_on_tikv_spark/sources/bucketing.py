"""Bucketed physical layout — co-located joins without a shuffle.

The reference gets key-local access by construction (TiKV regions are key
ranges; adjacency rows for one vertex are physically adjacent,
TikvTables.java:128-149).  The Spark analog for JOIN locality is bucketing:
both fact tables hash-partitioned into the same number of buckets on the
join key at WRITE time, so a later sort-merge join of the two needs no
exchange at all — the dominant shuffle of every orders⋈lineitem-shaped
query disappears from the plan.

This is the layout SCALE.md's partitioning table prescribes for the 100 TB
deployment; `write_bucketed` is the writer, and tests/test_plans.py proves
the exchange elimination on the actual physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, name: str, path: str, buckets: int, key: str,
                   sort: bool = True) -> None:
    """Write `df` as an external bucketed table (parquet at `path`,
    registered as `name`).  `sort=True` additionally sorts within buckets —
    the sort-merge join then skips its sort too.  Joining two tables
    bucketed with the SAME bucket count on their join keys produces an
    exchange-free (and sort-free) SMJ.

    The write repartitions on the bucket key first: `repartition(n, key)`
    and bucketBy share the same Murmur3 `pmod` hash, so each write task then
    holds exactly one bucket and each bucket lands in exactly ONE file.
    Without it, every input partition spills a file into every bucket
    (tasks × buckets small files), and — decisive for the join plan — Spark
    only reports the sortBy order to the optimizer when a bucket has a
    single file, so the SMJ would silently re-sort both sides."""
    writer = (df.repartition(buckets, F.col(key))
              .write.mode("overwrite").bucketBy(buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).format("parquet").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog —
    a plain path read would lose it and re-shuffle)."""
    return spark.table(name)
