"""One-pass column profiling — the data-quality summary every ingest of a
new 100 TB corpus starts with.

``profile_table`` computes per-column (n_rows, n_nonnull, n_distinct,
min, max) in a SINGLE aggregate over one scan: all per-column aggregates
are map-side-combinable, reduce to one row, and the long (one row per
column) shape is a stack() over that single row — no per-column scans, no
driver loop.

Exact ``count(DISTINCT col)`` for several columns at once makes Spark
expand the input (one duplicated stream per distinct column), which at
100 TB multiplies the shuffle by the column count — so ``approx=True``
switches to ``approx_count_distinct`` (HLL partials, one pass, no
expand), which is the scale default; exact mode is what the DuckDB
oracle can reproduce bit-for-bit and is fine at audit-sample sizes.

Numeric columns profile min/max as DOUBLE; with any non-numeric column in
the selection the whole min/max pair degrades to strings (one stable
output schema per call — engines format float→string differently, which
is why the oracle-checked driver row profiles numeric columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Profile `columns` (default: all) of `df` in one aggregate pass.

    Returns one row per column: (column, n_rows, n_nonnull, n_distinct,
    min_value, max_value)."""
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    if not cols:
        raise ValueError("profile_table needs at least one column")
    all_numeric = all(
        isinstance(df.schema[c].dataType, _NUMERIC) for c in cols)
    mm_type = "double" if all_numeric else "string"

    distinct = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"nn_{i}"),
            distinct(F.col(c)).alias(f"nd_{i}"),
            F.min(F.col(c)).cast(mm_type).alias(f"mn_{i}"),
            F.max(F.col(c)).cast(mm_type).alias(f"mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{i}, CAST(nd_{i} AS BIGINT), mn_{i}, mx_{i}"
        for i, c in enumerate(cols))
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nonnull, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nonnull", "n_distinct",
             "min_value", "max_value")
