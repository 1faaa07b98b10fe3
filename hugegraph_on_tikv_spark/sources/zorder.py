"""Z-order (Morton) layout — multi-column data skipping for one sort.

Parquet row-group pruning works off per-column min/max stats, so a table
sorted by column A skips beautifully on A-filters and not at all on B.
Interleaving the bits of A and B into one Morton value and sorting by THAT
gives every row group a tight min/max range on BOTH columns — the standard
lakehouse layout trick for "we filter this fact table by two or three
dimensions" (the multi-dimensional analog of the reference's single
sorted-KV dimension).

Mechanics: each column is linearly normalized to a `bits`-wide integer via
its global min/max (one cheap agg — for heavily skewed columns, pre-apply
a rank or log transform; linear is the documented default), bits are
interleaved JVM-side (pure shift/mask column expressions, whole-stage
codegen), and the writer range-partitions + sorts by the Morton value so
row groups tile the space.  Cost: one extra global sort at write time —
exactly what any sorted layout costs; reads need nothing special (the
z-value column is dropped; pruning happens through ordinary parquet
min/max stats on the original columns).

tests/test_plans.py quantifies the effect on real parquet footers: per-row-
group min/max spans shrink on BOTH interleaved columns vs a single-column
sort, which is the property row-group pruning actually consumes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map col linearly into [0, 2^bits): floor((x-lo)/(hi-lo) * (2^b - 1)).
    Degenerate range (hi == lo) maps everything to 0."""
    span = (hi - lo).cast("double")
    scaled = F.when(span > 0,
                    ((col.cast("double") - lo.cast("double")) / span)
                    * F.lit((1 << bits) - 1)).otherwise(F.lit(0.0))
    return F.floor(scaled).cast("long")


def z_value(normalized: list[Column], bits: int) -> Column:
    """Morton-interleave `bits`-wide integers: bit i of column j lands at
    position i*len(cols) + j.  Pure shift/mask expressions — codegen'd."""
    n = len(normalized)
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(normalized)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms)


def zorder_write(df: DataFrame, path: str, cols: list[str], bits: int = 12,
                 num_files: int = 8) -> None:
    """Write `df` as parquet tiled by the Morton order of `cols`:
    repartitionByRange + in-partition sort on the z-value, so each file /
    row group covers a compact hyper-rectangle and carries tight min/max
    stats on EVERY interleaved column.  The helper z-value never hits disk."""
    stats = df.agg(*[f(c).alias(f"{n}_{c}")
                     for c in cols for n, f in (("min", F.min), ("max", F.max))]
                   ).collect()[0]
    normalized = [
        _normalize(F.col(c), F.lit(stats[f"min_{c}"]), F.lit(stats[f"max_{c}"]),
                   bits)
        for c in cols
    ]
    (df.withColumn("__z", z_value(normalized, bits))
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))
