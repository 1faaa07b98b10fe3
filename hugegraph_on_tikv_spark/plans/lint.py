"""Physical-plan linter: the SCALE.md rules as an executable check.

`tests/test_plans.py` pins named plans; this utility makes the same audit
available for ANY DataFrame — run it in CI over new operators, or ad hoc
before promoting a query to a 100 TB cluster.  It inspects the EXECUTED
plan string (post-AQE where available), so it sees what would actually
run, and returns structured findings instead of asserting, letting callers
allowlist the smells that are documented contracts (e.g. the exact
cosine-top-k baseline is a BroadcastNestedLoopJoin *on purpose*).

Checked smells, each a (code, detail) finding:

* ``cartesian``          — CartesianProduct / BroadcastNestedLoopJoin:
  all-pairs work; quadratic unless one side is tiny by contract.
* ``python-row-udf``     — BatchEvalPython: row-at-a-time Python in the
  plan; ~10-100× slower than Arrow (ArrowEvalPython / mapInPandas are NOT
  flagged — the Arrow boundary is the sanctioned one).
* ``no-codegen``         — zero WholeStageCodegen spans in a plan that has
  at least one real operator: everything is running interpreted.
* ``unfiltered-scan``    — a parquet scan with neither PushedFilters nor
  a partition filter while the plan contains a Filter node: a predicate
  exists but never reached the scan (type mismatch / non-pushable
  expression / filter above a join).
* ``wide-scan``          — a scan reading 10+ columns feeding a plan whose
  final projection is much narrower (column pruning failed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    code: str
    detail: str


def _plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame, allow: set[str] | None = None) -> list[Finding]:
    """Audit `df`'s physical plan; returns findings not in `allow`."""
    allow = allow or set()
    phys = _plan_str(df)
    findings: list[Finding] = []

    if "CartesianProduct" in phys or "BroadcastNestedLoopJoin" in phys:
        findings.append(Finding(
            "cartesian",
            "all-pairs join (CartesianProduct/BroadcastNestedLoopJoin) — "
            "quadratic unless one side is tiny by documented contract"))
    if "BatchEvalPython" in phys:
        findings.append(Finding(
            "python-row-udf",
            "row-at-a-time Python UDF in the hot path — use built-in "
            "column functions or an Arrow-batched pandas UDF"))
    # codegen'd operators carry a "*(n)" stage prefix in the plan string
    # (explain("formatted") spells it WholeStageCodegen).  An AQE plan that
    # hasn't executed yet (isFinalPlan=false) hides the codegen wrapping
    # entirely — unknowable, so not flagged.
    if "isFinalPlan=false" not in phys and "*(" not in phys \
            and "WholeStageCodegen" not in phys and phys.count("\n") > 3:
        findings.append(Finding(
            "no-codegen",
            "no WholeStageCodegen span — the whole plan runs interpreted"))
    scans = [ln for ln in phys.splitlines() if "Scan parquet" in ln]
    if scans and "Filter" in phys and "PushedFilters: [" in phys:
        pushed_any = any("PushedFilters: [" in ln and "PushedFilters: []" not in ln
                         for ln in phys.splitlines())
        if not pushed_any and "PartitionFilters: [" not in phys:
            findings.append(Finding(
                "unfiltered-scan",
                "plan filters rows but no predicate reached any scan "
                "(PushedFilters all empty) — check predicate pushability"))
    for ln in scans:
        if "ReadSchema" in ln:
            schema_part = ln.split("ReadSchema:", 1)[1]
            n_cols = schema_part.count(":")
            if n_cols >= 10 and len(df.columns) <= n_cols // 2:
                findings.append(Finding(
                    "wide-scan",
                    f"scan reads ~{n_cols} columns for a {len(df.columns)}"
                    "-column result — column pruning failed"))
                break
    return [f for f in findings if f.code not in allow]
