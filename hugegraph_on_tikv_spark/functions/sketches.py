"""Approximate sketches — fixed-size mergeable state for the aggregations
that are exact-cost-prohibitive at 100 TB.

COUNT(DISTINCT x) is the canonical scale-killer: exact needs a shuffle of
every distinct value; the Datasketches HLL sketch replaces it with ~2^lgK
bytes per group, built with map-side partial aggregation and MERGEABLE —
sketch(A ∪ B) is computable from sketch(A), sketch(B) without the data.
Mergeability is the property everything else rides on: per-partition /
per-day sketches roll up to arbitrary windows, and a maintained view can
refresh per micro-batch (streaming/view_maintenance.py accepts `hll_cols`
measures) with no base rescan.

These are approximation ops by contract, so they carry error-bound pytest
coverage instead of SQL oracles (an oracle equality against DuckDB would
pin implementation details of the sketch, not the semantics).  Standard
HLL relative error ≈ 1.04/√(2^lgK) — about 1.6% at the default lgK=12 —
and the tests assert a conservative multiple of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # ~1.6% standard error, 4 KB per sketch


def hll_distinct(df: DataFrame, keys: list[str], value_col: str,
                 lgk: int = DEFAULT_LGK) -> DataFrame:
    """Per-key distinct-count sketch: (keys..., sketch binary).  One
    hash-aggregate with map-side partials — the raw values never shuffle,
    only fixed-size sketch buffers do."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk))
        .alias("sketch"))


def hll_merge_rows(df: DataFrame, keys: list[str],
                   sketch_col: str = "sketch") -> DataFrame:
    """Merge sketches ACROSS rows onto a coarser key (e.g. per-(day, host)
    sketches → per-day): the rollup that makes pre-sketched data servable
    at any granularity without touching raw values."""
    return df.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("sketch"))


def hll_merge_cols(a: Column, b: Column) -> Column:
    """NULL-tolerant two-sketch union (the view-maintenance merge shape:
    either side may be absent for a key after a full-outer join)."""
    return (F.when(a.isNull(), b).when(b.isNull(), a)
            .otherwise(F.hll_union(a, b)))


def hll_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def approx_quantiles(df: DataFrame, value_col: str, probs: list[float],
                     accuracy: int = 10_000) -> DataFrame:
    """Approximate quantiles (one row, array column `quantiles`) via
    percentile_approx — a mergeable KLL-style summary, O(accuracy) state
    per group instead of a global sort.  Rank error ≤ 1/accuracy by
    contract.  Exact quantiles (the oracle-checked path) live in
    `QueryEngine.splits`; this is the 100 TB path where an exact global
    sort of the value column is the thing being avoided."""
    return df.agg(F.percentile_approx(
        F.col(value_col), F.array(*[F.lit(p) for p in probs]),
        F.lit(accuracy)).alias("quantiles"))
