"""SparkSession factory tuned for the engine.

The reference manages its own session pool (TikvSessions.java:32-45,
TikvStdSessions.java:127-148); in Spark the SparkSession plays that role, so
this is the only session-management code we need.  The configs below are the
scale posture: AQE for runtime re-planning (skew joins, partition coalescing),
Arrow for any pandas-UDF boundary, and a shuffle-partition default sized for
local[32] tests — a real cluster deployment would raise it (or rely on AQE
coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hugegraph-on-tikv-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones, demote/promote join strategies with real stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local tests; cluster deployments override via spark-submit.
        .config("spark.sql.shuffle.partitions", "32")
        # Arrow batches for every pandas_udf / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation/supplier at any SF) broadcast freely.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Trust sortBy order of bucketed tables (off by default because it is
        # only valid with one file per bucket — write_bucketed guarantees
        # exactly that via its pre-write repartition on the bucket key), so
        # joins on bucketed copies elide the SMJ sort as well as the exchange.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
