"""Probe the g_louvain entry's round schedule: accept/reject pattern and
per-action wall clock (LOUVAIN_TRACE prints from analytics.py).

Usage: LOUVAIN_TRACE=1 python tools/louvain_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hugegraph_on_tikv_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark("louvain-probe")
    if os.environ.get("NO_AQE"):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    import __spark_entry__ as entrymod

    qs = entrymod.raw_queries()
    for r in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = qs["g_louvain"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        jobs = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        print(f"# g_louvain rep {r}: {time.perf_counter() - t0:.3f}s "
              f"jobs={jobs}", flush=True)


if __name__ == "__main__":
    main()
