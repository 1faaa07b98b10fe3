"""Streaming ingestion into engine tables (SURVEY.md §7 phase 5).

The reference ingests through buffered mutation batches flushed per commit
(M9).  The Structured-Streaming analog: each micro-batch becomes one
mutation commit — `foreachBatch` gives exactly the per-batch atomicity the
reference offers per TiKV batch, and the sink dedups on the key so
at-least-once delivery still yields idempotent upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog


def stream_upsert(stream_df: DataFrame, catalog: TableCatalog, table: str,
                  key: str | list[str], checkpoint_dir: str, available_now: bool = True):
    """writeStream → per-micro-batch upsert into a catalog table.

    Each micro-batch is applied as ONE per-table-atomic commit (version
    pointer swap).  Upsert-by-key makes replays idempotent — a stronger
    contract than the reference's non-transactional put batches.

    `key` may be a composite (list of columns) — the shape graph-edge
    streams need: an edge view keyed (src, dst, label) maintained
    incrementally from an edge stream, so every graph query sees the
    up-to-date adjacency without re-deriving the view from source tables."""
    keys = [key] if isinstance(key, str) else list(key)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # one per-table-atomic commit per micro-batch, through the catalog's
        # public bulk-upsert API (dedups within the batch, anti-join + union)
        catalog.upsert(table, batch_df, keys)

    writer = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
