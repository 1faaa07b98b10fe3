"""Capture `.explain("formatted")` for named roster/bench queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Usage: python tools/capture_plans.py <suffix> [names...]
  suffix: "before" / "after" (file name suffix)
  names:  raw_queries() names; defaults to the bench headliners + extras.

Iterative operators (pagerank/louvain/forest/...) run eager jobs at
DataFrame-construction time and localCheckpoint their state, so their
captured plan shows the FINAL assembled stage over the checkpointed
intermediates — the per-round shapes are pinned separately in
tests/test_plans.py.  Non-iterative queries capture the full lazy plan.

Writes to plans/r11/ by default; override with PLANS_DIR.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hugegraph_on_tikv_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.environ.get(
    "PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "plans", "r11"))

DEFAULT = [
    "s1_scan_all", "a1_count", "q1_pricing_summary", "q3_shipping_priority",
    "q6_forecast_revenue", "g_degree", "g_khop2", "win_tumbling",
    "sim_cosine_topk_vectorized", "sim_cosine_topk", "dedup_minhash_lsh",
    "g_pagerank",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    import __spark_entry__ as entrymod

    qs = entrymod.raw_queries() if hasattr(entrymod, "raw_queries") else entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"# skip {name}: not in roster", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # capture the failure, don't sink the batch
            plan = f"ERROR capturing plan: {ex}"
        out = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"# wrote {out} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
