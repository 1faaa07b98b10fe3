"""Shared differential-comparison harness: Spark result vs DuckDB oracle.

Mimics the driver's t2 gate (row count + column names + order-insensitive
value multiset) so mismatches surface locally at sf0.001 before the driver
runs the real check at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from hugegraph_on_tikv_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()

    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"{name}: column mismatch spark={s_cols} oracle={o_cols}")
        return problems
    # The real driver hashes stringified values, so an int64 column on one
    # side and float64 on the other ("36014" vs "36014.0") is a hash
    # mismatch even when values are numerically equal (e.g. DuckDB
    # SUM(BIGINT) -> HUGEINT -> pandas float64).  Python's int == float
    # would mask it below, so flag dtype-kind divergence explicitly.
    for c in s_cols:
        kinds = {sdf[c].dtype.kind, odf[c].dtype.kind}
        if kinds in ({"i", "f"}, {"u", "f"}):
            problems.append(
                f"{name}: dtype mismatch col={c} spark={sdf[c].dtype} "
                f"oracle={odf[c].dtype} (driver hashes str values; cast both sides)"
            )
    if len(sdf) != len(odf):
        problems.append(f"{name}: row count spark={len(sdf)} oracle={len(odf)}")

    def multiset(df):
        rows = [tuple(_norm(v) for v in row) for row in df[s_cols].itertuples(index=False, name=None)]
        return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

    s_rows, o_rows = multiset(sdf), multiset(odf)
    if s_rows != o_rows:
        diffs = 0
        for a, b in zip(s_rows, o_rows):
            if a != b:
                problems.append(f"{name}: row diff spark={a!r} oracle={b!r}")
                diffs += 1
                if diffs >= 5:
                    break
        if len(s_rows) != len(o_rows):
            problems.append(f"{name}: multiset sizes differ")
        if not problems:
            problems.append(f"{name}: multisets differ (no aligned diff?)")
    return problems
