"""Skew-join measurement: AQE skew-split vs salted_join on a hub-key join.

VERDICT r4 #7: the salted path was justified by argument, not measurement.
This script generates a deliberately power-law fact table (one hub key
holding `skew` of all rows, the rest uniform), joins it to a
broadcast-ineligible dimension side, and times three strategies:

  * plain    — shuffle join, AQE skew handling OFF (the pain baseline)
  * aqe      — AQE skew-join splitting ON (thresholds lowered so the hub
               partition qualifies at this fixture size; at 100 TB the
               defaults fire on their own)
  * salted   — operators/joins.salted_join (explicit `salt`-way split)

Broadcast is disabled throughout: the experiment models the regime where
the build side is far over any broadcast threshold — otherwise Spark would
(correctly) broadcast and no skew exists.  Run it alone on an idle box:

    python tools/skew_bench.py [n_rows] [salt]

Prints one JSON line per (skew, strategy) with median-of-3 wall seconds.
Results recorded in SCALE.md §"Skew & memory".
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.operators.joins import salted_join

N_KEYS = 100_000


def build_fixture(spark, root: str, n_rows: int, skew: float) -> tuple[str, str]:
    """facts: n_rows rows; `skew` fraction on hub key 0, rest uniform over
    N_KEYS keys.  dim: one row per key with a padding payload (so the build
    side is emphatically not broadcast-sized per-row)."""
    facts = spark.range(n_rows).select(
        F.when(F.col("id") % F.lit(int(1 / skew)) == 0, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), F.lit(N_KEYS)))
        .cast("long").alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    f_path, d_path = f"{root}/facts_{skew}", f"{root}/dim"
    facts.write.mode("overwrite").parquet(f_path)
    dim.write.mode("overwrite").parquet(d_path)
    return f_path, d_path


def run_once(spark, f_path: str, d_path: str, strategy: str, salt: int) -> float:
    spark.catalog.clearCache()
    facts = spark.read.parquet(f_path)
    dim = spark.read.parquet(d_path)
    t0 = time.time()
    if strategy == "salted":
        out = salted_join(facts, dim, "k", salt=salt)
    else:
        out = facts.join(dim, "k")
    # checksum aggregation: forces every joined row through the plan
    out.agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    return time.time() - t0


def session(aqe_skew: bool) -> SparkSession:
    b = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", str(aqe_skew).lower())
        # lowered so the hub partition qualifies at this fixture size
        # (defaults: 256m threshold / 5x factor — tuned for real clusters)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    return b.getOrCreate()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    salt = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    root = tempfile.mkdtemp(prefix="skew_bench_")
    results = []
    try:
        spark = session(aqe_skew=False)
        paths = {skew: build_fixture(spark, root, n_rows, skew)
                 for skew in (0.25, 0.5)}
        current_aqe = False
        for skew in (0.25, 0.5):
            f_path, d_path = paths[skew]
            for strategy in ("plain", "aqe", "salted"):
                want_aqe = strategy == "aqe"
                if want_aqe != current_aqe:
                    spark.stop()
                    spark = session(aqe_skew=want_aqe)
                    current_aqe = want_aqe
                times = [run_once(spark, f_path, d_path, strategy, salt)
                         for _ in range(3)]
                rec = {"skew": skew, "strategy": strategy,
                       "median_s": round(statistics.median(times), 2),
                       "times": [round(t, 2) for t in times],
                       "n_rows": n_rows, "salt": salt}
                results.append(rec)
                print(json.dumps(rec), flush=True)
        spark.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
