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
* ``unfiltered-scan``    — a Filter node whose condition references only
  columns a single scan outputs (so pushdown was possible in principle),
  while that scan has neither PushedFilters nor PartitionFilters: the
  predicate never reached the scan (type mismatch / non-pushable
  expression).  Filters over aggregate/window/join-derived columns are
  exempt — those can never push.
* ``wide-scan``          — a scan reading 10+ columns feeding a plan whose
  final projection is much narrower (column pruning failed).

The two scan checks parse ``explain("formatted")`` (one detail line per
scan attribute) rather than the simple plan string, whose single-line
scans are truncated at ``maxToStringFields`` — exactly where wide scans
would otherwise escape the audit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    code: str
    detail: str


def _plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted_str(df: DataFrame) -> str:
    """explain('formatted') as a string: every scan's details (Output [n],
    PushedFilters, PartitionFilters) land on their OWN full-length lines,
    immune to the single-line truncation (`maxToStringFields`) that makes
    the simple plan string unreliable for wide scans."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception:   # pragma: no cover — connect-mode / API drift
        return ""


def _scan_details(fmt: str) -> list[dict]:
    """Parse each `(n) Scan parquet` node block of a formatted plan into
    {output_n, pushed, partition}.  A detail line that is absent (Spark
    omits `PushedFilters:` entirely when nothing pushed) reads as empty."""
    out: list[dict] = []
    lines = fmt.splitlines()
    for i, ln in enumerate(lines):
        if not re.match(r"^\(\d+\) Scan parquet", ln):
            continue
        d = {"output_n": None, "pushed": "", "partition": "", "attrs": set()}
        for j in range(i + 1, len(lines)):
            nxt = lines[j]
            if re.match(r"^\(\d+\) ", nxt) or not nxt.strip():
                break
            if m := re.match(r"^Output \[(\d+)\]: (.*)$", nxt):
                d["output_n"] = int(m.group(1))
                d["attrs"] = set(re.findall(r"#(\d+)", m.group(2)))
            elif m := re.match(r"^PushedFilters: \[(.*)\]\s*$", nxt):
                d["pushed"] = m.group(1).strip()
            elif m := re.match(r"^PartitionFilters: \[(.*)\]\s*$", nxt):
                d["partition"] = m.group(1).strip()
        out.append(d)
    return out


def _filter_conditions(fmt: str) -> list[set[str]]:
    """Attribute-id sets referenced by each Filter node's Condition line."""
    out: list[set[str]] = []
    lines = fmt.splitlines()
    for i, ln in enumerate(lines):
        if not re.match(r"^\(\d+\) Filter", ln):
            continue
        for j in range(i + 1, len(lines)):
            nxt = lines[j]
            if re.match(r"^\(\d+\) ", nxt) or not nxt.strip():
                break
            if m := re.match(r"^Condition\s*:\s*(.*)$", nxt):
                out.append(set(re.findall(r"#(\d+)", m.group(1))))
    return out


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
    # scan checks run on the FORMATTED plan: each scan's Output [n] /
    # PushedFilters / PartitionFilters are full-length detail lines there,
    # where the simple plan string truncates wide scans (the exact target
    # of the wide-scan check) and always embeds the literal substrings
    # "Filter"/"PartitionFilters: [" that made the old string checks dead.
    fmt = _formatted_str(df)
    scans = _scan_details(fmt)
    # unfiltered-scan fires only when pushdown was POSSIBLE in principle:
    # some Filter's condition references only attributes a single scan
    # outputs (attr #ids are plan-unique, so containment means the filter
    # sits over that scan's raw columns — not over an aggregate, window,
    # or join-derived column, which can never push) yet that scan carries
    # neither pushed nor partition filters.
    for cond_attrs in _filter_conditions(fmt):
        if not cond_attrs:
            continue
        culprit = next(
            (s for s in scans
             if s["attrs"] and cond_attrs <= s["attrs"]
             and not (s["pushed"] or s["partition"])), None)
        if culprit is not None:
            findings.append(Finding(
                "unfiltered-scan",
                "a filter over raw scan columns never reached the scan "
                "(PushedFilters and PartitionFilters empty) — "
                "check predicate pushability"))
            break
    for s in scans:
        n_cols = s["output_n"]
        if n_cols is not None and n_cols >= 10 and len(df.columns) <= n_cols // 2:
            findings.append(Finding(
                "wide-scan",
                f"scan reads {n_cols} columns for a {len(df.columns)}"
                "-column result — column pruning failed"))
            break
    return [f for f in findings if f.code not in allow]
