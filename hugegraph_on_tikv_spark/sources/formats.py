"""Multi-format source/sink layer.

The reference reads exactly one physical format (TiKV key-value pairs,
TikvStdSessions.java:85-86); an analytics engine meeting users where their
data lives needs more.  Batch: parquet (the native format), CSV, JSON
lines, ORC.  Streaming: file-discovery streams over CSV/JSON/parquet
directories (`read_stream`), which compose with streaming/ingest.

Design rules for 100 TB:

* schemas are EXPLICIT for text formats.  `inferSchema`/schema-less JSON
  reads scan the data once just to guess types — a full extra pass at
  scale — and can guess differently between runs as data drifts.  Callers
  pass a DDL string or StructType; `schema_of(table)` supplies the fixture
  tables' canonical schemas.
* text formats are an INGEST EDGE, not a working set: `convert(...)`
  rewrites them to parquet (optionally partitioned) so every downstream
  scan gets pushdown, pruning, and row-group skipping.  Keeping a pipeline
  on CSV forfeits all three.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
}

_FORMATS = ("parquet", "csv", "json", "orc")


def infer_format(path: str) -> str:
    """Format from the path's extension (directory sinks keep their suffix:
    /data/lineitem.csv/ is a CSV directory)."""
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    fmt = _EXT_TO_FORMAT.get(ext.lower())
    if fmt is None:
        raise ValueError(f"cannot infer format from {path!r}; pass fmt= explicitly")
    return fmt


def read_any(spark: SparkSession, path: str, fmt: str | None = None,
             schema=None, **options) -> DataFrame:
    """Read a dataset in any supported format.

    CSV/JSON require `schema` (DDL string or StructType) — see the module
    docstring for why inference is banned.  CSV defaults: header=true,
    ISO timestamps."""
    fmt = fmt or infer_format(path)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {_FORMATS}")
    reader = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} reads require an explicit schema (inference costs a "
                "full extra scan and is nondeterministic under data drift)")
        reader = reader.schema(schema)
    elif schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **options}
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str | None = None,
              mode: str = "error", partition_by: list[str] | None = None,
              **options) -> None:
    """Write a DataFrame in any supported format.  `partition_by` produces a
    hive-layout directory tree — the thing that turns downstream equality
    filters on those columns into partition pruning."""
    fmt = fmt or infer_format(path)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {_FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        options = {"header": "true", **options}
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).options(**options).save(path)


def convert(spark: SparkSession, src: str, dst: str,
            src_fmt: str | None = None, dst_fmt: str | None = None,
            schema=None, partition_by: list[str] | None = None,
            mode: str = "error", **read_options) -> None:
    """Ingest-edge conversion: read `src`, write `dst` (default parquet).
    One distributed pass, no driver materialization."""
    df = read_any(spark, src, src_fmt, schema, **read_options)
    write_any(df, dst, dst_fmt or "parquet", mode=mode, partition_by=partition_by)


def read_stream(spark: SparkSession, path: str, fmt: str | None = None,
                schema=None, **options) -> DataFrame:
    """File-discovery streaming source: new files landing under `path`
    become micro-batches.  Schema is REQUIRED (streaming sources can't
    infer), which the batch rules above already demand for text formats.
    Composes with streaming/ingest.stream_upsert for exactly the
    reference's buffered-commit ingestion shape (M9), driven by files."""
    fmt = fmt or infer_format(path)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {_FORMATS}")
    if schema is None:
        raise ValueError("streaming reads require an explicit schema")
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **options}
    return reader.format(fmt).options(**options).load(path)
