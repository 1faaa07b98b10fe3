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


# -- count-min: mergeable frequency sketch ----------------------------------

CM_WIDTH, CM_DEPTH = 2048, 4


def _cm_bucket(value: Column, d: int, width: int) -> Column:
    """Row-d bucket for a value: H48(d ':' value) mod width — the engine's
    portable md5 hash contract, so the sketch is reproducible anywhere."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), value.cast("string"))),
                    1, 12), 16, 10).cast("long")
    return h % width


def count_min_sketch(df: DataFrame, value_col: str, width: int = CM_WIDTH,
                     depth: int = CM_DEPTH) -> DataFrame:
    """Count-min frequency sketch as TRANSPARENT counter rows (d, w, c):
    ≤ depth×width rows regardless of input size.  Unlike an opaque binary
    sketch, the counters are plain exact sums — two sketches merge by
    unioning and summing (bit-exactly: merge of halves == sketch of the
    whole), they survive as an incremental-view measure, and the whole
    structure is SQL-expressible for oracle checks.  Estimates are
    one-sided: est(v) ≥ true(v), with overshoot ≤ n/width per row and the
    min over `depth` independent rows taken."""
    buckets = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cm_bucket(F.col(value_col), d, width).alias("w"))
        for d in range(depth)
    ])
    # explode, not a depth-way self-union: ONE scan of the input feeds all
    # depth rows
    return (df.select(F.explode(buckets).alias("b"))
            .groupBy(F.col("b.d").alias("d"), F.col("b.w").alias("w"))
            .agg(F.count(F.lit(1)).alias("c")))


def count_min_estimate(sketch: DataFrame, values: DataFrame, value_col: str,
                       width: int = CM_WIDTH, depth: int = CM_DEPTH) -> DataFrame:
    """Frequency estimates for `values[value_col]` (distinct): min over the
    depth rows of the matching counters.  A value hashing to an untouched
    bucket in any row estimates 0 (coalesce) — correct for unseen values."""
    buckets = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cm_bucket(F.col(value_col), d, width).alias("w"))
        for d in range(depth)
    ])
    p = (values.select(value_col).distinct()
         .select(F.col(value_col), F.explode(buckets).alias("b"))
         .select(value_col, F.col("b.d").alias("d"), F.col("b.w").alias("w")))
    return (p.join(sketch, ["d", "w"], "left")
            .groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")))


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches (same width/depth): counters add — exact, order-
    independent, the property that makes per-partition / per-day sketches
    roll up to any window."""
    return a.unionByName(b).groupBy("d", "w").agg(F.sum("c").alias("c"))


# -- heavy hitters: Misra-Gries candidates + exact verify --------------------

def misra_gries_candidates(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, merged: ≤ k candidate values per
    partition regardless of partition size (distinct `value` strings).

    The MG guarantee per partition: every item with local frequency
    > N_p/(k+1) survives its summary (each decrement round cancels k+1
    occurrences, so undercount ≤ N_p/(k+1)).  The per-partition loop is
    amortized O(1) per row (total decrements ≤ total increments) inside ONE
    Arrow-batched generator that spans the partition — only the ≤ k summary
    rows per partition ever leave Python."""
    import pandas as pd

    def run(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf["value"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"value": list(counters)})

    return (df.select(F.col(value_col).cast("string").alias("value"))
            .mapInPandas(run, "value string").distinct())


def heavy_hitters(df: DataFrame, value_col: str, threshold_frac: float,
                  slack: int = 2) -> DataFrame:
    """EXACT frequent items at scale: `(value, n_occurrences)` for every
    value occurring in at least `threshold_frac` of the rows.

    The naive plan — groupBy(value).count() — shuffles every distinct value
    (at 100 TB of tokens, that is the whole vocabulary with its long tail).
    This is the classic two-pass sketch-filter instead:

    1. per-partition Misra-Gries with k = slack·⌈1/f⌉ counters.  Averaging:
       a value with global frequency ≥ f·N has ≥ f·N_p occurrences in at
       least one partition, and f·N_p > N_p/(k+1) whenever slack ≥ 2 — so
       every true heavy hitter IS among the merged candidates (superset
       guarantee; false candidates are fine, they just pay a little in
       pass 2);
    2. exact verification: broadcast-semi-filter the data to candidate
       values only, one small groupBy, threshold filter.

    The result is EXACT (hence SQL-oracle-able) and independent of row
    order or partitioning — MG's internal order sensitivity only moves
    which non-hitters pad the candidate set.  Cost: two scans, but the
    shuffle carries ≤ k·partitions candidate rows instead of the
    vocabulary."""
    import math

    if not (0 < threshold_frac <= 1):
        raise ValueError("threshold_frac must be in (0, 1]")
    k = slack * math.ceil(1 / threshold_frac)
    vals = df.select(F.col(value_col).cast("string").alias("value")) \
        .filter(F.col("value").isNotNull())
    n_total = vals.count()
    support = math.ceil(threshold_frac * n_total)
    cands = misra_gries_candidates(df, value_col, k)
    return (
        vals.join(F.broadcast(cands), "value", "leftsemi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= support)
    )
