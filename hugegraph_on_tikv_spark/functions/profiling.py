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


NULL_SENTINEL = "\x00"


def table_checksum(df: DataFrame, cols: list[str] | None = None,
                   buckets: int = 16, id_col: str | None = None) -> DataFrame:
    """Order-independent per-bucket checksums for cheap table comparison —
    the anti-entropy primitive (pt-table-checksum-style): two replicas /
    two clusters / a table before and after a migration compare `buckets`
    rows instead of the table, and a mismatched bucket narrows the diff to
    1/buckets of the data.

    Per row: md5 over the canonical encoding (columns joined by '|' with a
    NUL sentinel for NULL — concat_ws would silently SKIP nulls and make
    ('a', NULL) collide with (NULL, 'a'); values are escaped ``\\``→``\\\\``,
    ``|``→``\\|``, NUL→``\\0`` so the encoding is INJECTIVE — without it
    ('a|b','c') and ('a','b|c') would checksum identically), folded to 60
    bits.  Per bucket
    (md5 of the id/whole row, mod buckets): n_rows and the BIT_XOR of the
    row hashes — XOR is commutative/associative, so the aggregate is
    order- and partitioning-independent, map-side combinable, and two
    checksum tables merge with another XOR.

    Float columns should be quantized/rounded to strings by the caller
    first: float→string formatting is not engine-portable, integers and
    strings are."""
    cols = list(cols) if cols is not None else list(df.columns)

    def _canon(c: str):
        v = F.col(c).cast("string")
        v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
        v = F.replace(v, F.lit("|"), F.lit("\\|"))
        v = F.replace(v, F.lit(NULL_SENTINEL), F.lit("\\0"))
        return F.coalesce(v, F.lit(NULL_SENTINEL))

    enc = F.concat_ws("|", *[_canon(c) for c in cols])
    row_h = F.conv(F.substring(F.md5(enc), 1, 15), 16, 10).cast("long")
    bucket_src = F.col(id_col).cast("string") if id_col else enc
    bucket = (F.conv(F.substring(F.md5(bucket_src), 1, 12), 16, 10)
              .cast("long") % buckets)
    return (df.select(bucket.alias("bucket"), row_h.alias("_h"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(_h)").alias("checksum")))


def histogram(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """Equi-width histogram: (bin, bin_lo, bin_hi, n) for `nbins` bins over
    [min, max].  Two passes over the column — a min/max scalar aggregate
    broadcast back (1-row crossJoin), then one groupBy on the computed bin
    index — both map-side combinable.  The top edge closes into the last
    bin (least(floor(...), nbins-1)); a constant column collapses to bin 0.
    All bin arithmetic is IEEE doubles from exact min/max selections, so
    the DuckDB mirror reproduces the exact same bin boundaries."""
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    base = df.filter(F.col(col).isNotNull()) \
        .select(F.col(col).cast("double").alias("x"))
    mm = base.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    w = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    binned = base.join(F.broadcast(mm)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(F.least(
            F.floor((F.col("x") - F.col("mn")) / w).cast("int"),
            F.lit(nbins - 1))).alias("bin"),
        F.col("mn"), F.col("mx"))
    return (binned.groupBy("bin", "mn", "mx")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "bin",
                (F.col("mn") + F.col("bin") * w).alias("bin_lo"),
                (F.col("mn") + (F.col("bin") + 1) * w).alias("bin_hi"),
                "n"))


def histogram_equidepth(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """Equi-depth histogram: (bin, bin_hi, n) where bin_hi is the EXACT
    percentile_disc(i/nbins) edge — an actual data value, so any ANSI
    engine reproduces the identical boundaries (the property splits() uses
    for shard metadata; approx sketches trade that away).  Bin of x = the
    first edge ≥ x; duplicate-heavy columns legitimately yield empty bins
    between repeated edges rather than misassigned rows.

    One exact-percentile aggregate (state bounded by the column's distinct
    count on one reducer — same caveat as splits(exact=True)), broadcast
    back as a scalar row, then one groupBy."""
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    base = df.filter(F.col(col).isNotNull()) \
        .select(F.col(col).cast("double").alias("x"))
    edges = base.agg(*[
        F.expr(f"percentile_disc({i / nbins}) WITHIN GROUP (ORDER BY x)")
        .alias(f"q{i}") for i in range(1, nbins + 1)])
    binned = base.join(F.broadcast(edges))
    bin_expr = None
    for i in range(1, nbins):
        cond = F.col("x") <= F.col(f"q{i}")
        bin_expr = (F.when(cond, i - 1) if bin_expr is None
                    else bin_expr.when(cond, i - 1))
    bin_expr = (F.lit(0) if bin_expr is None
                else bin_expr.otherwise(nbins - 1))
    binned = binned.select(bin_expr.alias("bin"),
                           *[F.col(f"q{i}") for i in range(1, nbins + 1)])
    hi = None
    for i in range(1, nbins + 1):
        cond = F.col("bin") == i - 1
        hi = F.when(cond, F.col(f"q{i}")) if hi is None else hi.when(cond, F.col(f"q{i}"))
    return (binned.groupBy("bin", *[f"q{i}" for i in range(1, nbins + 1)])
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bin", hi.alias("bin_hi"), "n"))


def checksum_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two checksum tables disagree (full-outer on bucket):
    the scope an anti-entropy repair has to rescan."""
    an = a.select("bucket", F.col("n_rows").alias("n_a"),
                  F.col("checksum").alias("ck_a"))
    bn = b.select("bucket", F.col("n_rows").alias("n_b"),
                  F.col("checksum").alias("ck_b"))
    j = an.join(bn, "bucket", "full_outer")
    return j.filter(
        ~(F.col("n_a").eqNullSafe(F.col("n_b"))
          & F.col("ck_a").eqNullSafe(F.col("ck_b"))))


def corr_expr(i: int, j: int) -> str:
    """Pearson r from the exact integer sums, as one SQL string valid —
    and textually identical — in Spark SQL and DuckDB.  Every sum is
    CAST to DOUBLE first (exact integer → nearest double is IEEE-defined),
    then the formula runs in doubles (+,-,*,/ and the correctly-rounded
    sqrt are all IEEE-specified), so both engines produce the identical
    bits with zero rounding slack."""
    n = "CAST(n_pairs AS DOUBLE)"
    sx, sy = f"CAST(s_{i} AS DOUBLE)", f"CAST(s_{j} AS DOUBLE)"
    sxx, syy = f"CAST(ss_{i} AS DOUBLE)", f"CAST(ss_{j} AS DOUBLE)"
    sxy = f"CAST(sp_{i}_{j} AS DOUBLE)"
    num = f"(({n} * {sxy}) - ({sx} * {sy}))"
    dx = f"sqrt(({n} * {sxx}) - ({sx} * {sx}))"
    dy = f"sqrt(({n} * {syy}) - ({sy} * {sy}))"
    return f"({num} / ({dx} * {dy}))"


def corr_pairs(df: DataFrame, cols: list[str], scale: int = 100) -> DataFrame:
    """Exact-arithmetic Pearson correlation for every column pair, in ONE
    aggregate pass.

    Values are quantized to integers (round(x·scale)) and summed as
    DECIMAL — addition is associative over exact integers, so the
    distributed sums are order-independent, unlike a float Σxy (the same
    trick as corpus_df_stats/harmonic_closeness).  The quantized products
    are built as DECIMAL(18,0)×DECIMAL(18,0) → DECIMAL(37,0) BEFORE
    summation, so nothing ever rides an overflowing BIGINT; the final
    formula converts each exact sum to double once (corr_expr).  The
    result is the exact Pearson r of the QUANTIZED values — a documented
    contract (scale picks the precision), engine-portable to the last bit.

    One scan, one map-side-combinable aggregate row, stack() to the pair
    list — scales like count(*)."""
    if len(cols) < 2:
        raise ValueError("corr_pairs needs at least two columns")
    # complete-case rows so n matches every sum.  An explicit isNotNull
    # conjunction, NOT na.drop: the latter compiles to AtLeastNNonNulls,
    # which cannot push to the parquet scan; IsNotNull conjuncts can.
    for c in cols:
        df = df.filter(F.col(c).isNotNull())
    # Overflow must fail LOUDLY: under non-ANSI mode a bare CAST of an
    # overflowing round(x*scale) yields NULL, which SUM silently skips
    # while n_pairs still counts the row — a quietly wrong r.  Guard each
    # value at 9e17 (conservatively under DECIMAL(18,0)'s 1e18-1, beyond
    # double ulp) and raise_error past it.
    q = {c: F.expr(
        f"CASE WHEN abs(round({c} * {scale})) < 9e17 "
        f"THEN CAST(round({c} * {scale}) AS DECIMAL(18,0)) "
        f"ELSE CAST(raise_error('corr_pairs: {c} * {scale} overflows "
        f"the exact-integer quantization; lower scale') "
        f"AS DECIMAL(18,0)) END")
        for c in cols}
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(q[c]).alias(f"s_{i}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"ss_{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(F.sum(q[cols[i]] * q[cols[j]]).alias(f"sp_{i}_{j}"))
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{cols[i]}', '{cols[j]}', {corr_expr(i, j)}"
        for i in range(len(cols)) for j in range(i + 1, len(cols)))
    n_p = sum(1 for i in range(len(cols)) for _ in range(i + 1, len(cols)))
    return one.selectExpr(
        f"stack({n_p}, {pairs}) AS (col_a, col_b, corr)")


def expectations_report(df: DataFrame, checks: dict[str, str]) -> DataFrame:
    """Declarative data-quality audit (the CHECK-constraint / expectation
    suite face): each entry is name → boolean SQL expression; the report
    is one row per check — (check_name, n_rows, n_violations).

    Violation semantics are strict: a row violates unless the expression
    is literally TRUE (false AND NULL both count — a NULL-lenient CHECK
    silently passes exactly the rows dirty data produces, so expectations
    invert that default; write `col IS NULL OR pred` to opt a column out).

    ONE scan, one map-side-combinable aggregate row regardless of check
    count, stack()ed to the report — scales like count(*)."""
    if not checks:
        raise ValueError("expectations_report needs at least one check")
    bad_names = [n for n in checks if "'" in n or "\\" in n]
    if bad_names:
        raise ValueError(
            f"check names must not contain quotes/backslashes "
            f"(they are embedded in the report literal): {bad_names}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (name, expr) in enumerate(checks.items()):
        viol = ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        aggs.append(F.sum(F.when(viol, 1).otherwise(0)).alias(f"_v{i}"))
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', CAST(_n AS BIGINT), CAST(_v{i} AS BIGINT)"
        for i, name in enumerate(checks))
    return one.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, n_rows, n_violations)")


def enforce_expectations(df: DataFrame, checks: dict[str, str]) -> DataFrame:
    """Gate a pipeline stage on its expectations: runs the report and
    RAISES (listing every failing check with its violation count) if any
    check has violations; returns the input unchanged otherwise — the
    write-path guard in front of a TableCatalog commit."""
    bad = [(r["check_name"], r["n_violations"], r["n_rows"])
           for r in expectations_report(df, checks).collect()
           if r["n_violations"] > 0]
    if bad:
        detail = ", ".join(f"{n}: {v}/{t} rows" for n, v, t in bad)
        raise ValueError(f"expectations failed — {detail}")
    return df


def mad_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                 id_col: str, k: tuple[int, int] = (3, 1), scale: int = 100,
                 exact: bool = True) -> DataFrame:
    """Robust per-group anomaly detection: flag rows whose deviation from
    the group median exceeds k x MAD (median absolute deviation) — the
    classical outlier rule that, unlike mean/stddev z-scores, a single
    extreme value cannot drag.

    Exactness: values are scaled to integers (`scale`, the _money cents
    trick), medians are DISCRETE percentiles (percentile_disc — a real
    data value, no interpolation), and the k x MAD comparison is the
    integer cross-multiplication dev * k_den > k_num * mad, so the flag
    set is bit-identical across engines.  `k` is the (num, den) rational.
    robust_z = dev/mad is the single float division (NULL when mad = 0 —
    there any nonzero deviation is already flagged by the exact rule).

    Output: one row per OUTLIER (group cols, row_id, v, med, mad, dev,
    robust_z), all in scaled-integer units.

    Scale shape: two aggregate passes (median, then MAD of deviations)
    with group-cardinality results broadcast back — the per-row stream
    never shuffles.  Like QueryEngine.splits, exact percentile_disc
    concentrates each GROUP's values on one reducer: right while groups
    are bounded (event types, tenants); for extreme per-group volume pass
    exact=False to use approx_percentile sketches (bounded memory,
    engine-specific boundaries — excluded from oracle checks by
    contract)."""
    k_num, k_den = k
    if k_num <= 0 or k_den <= 0:
        raise ValueError(f"k must be a positive rational, got {k}")

    def _median(frame: DataFrame, col: str, alias: str) -> DataFrame:
        if exact:
            agg = F.expr(f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {col})")
        else:
            agg = F.expr(f"approx_percentile({col}, 0.5)")
        return frame.groupBy(*group_cols).agg(agg.cast("long").alias(alias))

    base = df.select(*group_cols, F.col(id_col).alias("row_id"),
                     F.round(F.col(value_col) * scale).cast("long").alias("v"))
    med = _median(base, "v", "med")
    dev = (base.join(F.broadcast(med), group_cols)
           .withColumn("dev", F.abs(F.col("v") - F.col("med"))))
    mad = _median(dev, "dev", "mad")
    return (dev.join(F.broadcast(mad), group_cols)
            .filter(F.col("dev") * k_den > F.lit(k_num) * F.col("mad"))
            .withColumn("robust_z",
                        F.when(F.col("mad") > 0,
                               F.col("dev").cast("double") / F.col("mad")))
            .select(*group_cols, "row_id", "v", "med", "mad", "dev",
                    "robust_z"))
