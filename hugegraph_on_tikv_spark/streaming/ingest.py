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


def stream_dedup(stream_df: DataFrame, key_cols: list[str],
                 event_time_col: str, watermark: str = "30 minutes"):
    """Exactly-once-by-key over an at-least-once firehose:
    `dropDuplicatesWithinWatermark` keeps the FIRST arrival per key and
    drops re-deliveries arriving within the watermark window.

    This is the ingest-side dedup of a training-data pipeline (exact dedup
    by content fingerprint or event id) in streaming form.  State is
    bounded: a key's entry is evicted once the watermark passes its event
    time — O(watermark window of keys), not O(stream) — which is why this
    uses dropDuplicatesWithinWatermark and not plain dropDuplicates (whose
    state in a stream grows forever).  The contract is therefore scoped:
    duplicates farther apart in EVENT TIME than the watermark can both
    survive; size the watermark to the redelivery horizon (retry windows,
    not corpus history — corpus-wide dedup is the batch dedup_* family).

    Returns the deduplicated streaming DataFrame (attach your own sink);
    the event-time column must be instant-typed (see ntz_as_utc_instant
    for NTZ sources)."""
    return (stream_df.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def stream_windowed_counts(stream_df: DataFrame, value_col: str,
                           event_time_col: str, window: str = "1 hour",
                           watermark: str = "30 minutes",
                           min_count: int | None = None) -> DataFrame:
    """Streaming per-window value counts — the streaming face of the batch
    heavy-hitters operator: a watermarked tumbling-window groupBy whose
    state is bounded by (windows in flight) × (distinct values per
    window), evicted as the watermark passes each window end.

    `min_count` filters to the frequent values (threshold form of heavy
    hitters).  Unlike the batch Misra-Gries pass there is no candidate
    stage: streaming state is already per-group incremental, so the
    windowed count IS the exact answer for every window the watermark has
    closed; the cost model to watch is distinct-value cardinality per
    window, which `min_count` does NOT reduce (filtering happens on
    output, state holds every value) — cap upstream (hash-bucket the
    value space) when values are unbounded."""
    out = (
        stream_df.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window).alias("w"),
                 F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "value", "n_occurrences")
    )
    if min_count is not None:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def stream_enrich(stream_df: DataFrame, dim_df: DataFrame,
                  on: str | list[str], how: str = "left",
                  broadcast_dim: bool = True) -> DataFrame:
    """Stream-static dimension enrichment — the standard fact-stream ×
    dimension join.  Stream-static joins are STATELESS in Structured
    Streaming: no watermark, no state store, and the static side is
    re-planned at every micro-batch, so a dimension served from a
    TableCatalog view picks up version swaps between batches without
    restarting the query.

    broadcast_dim=True hints the broadcast — a stateless map-side hash
    join per batch, the plan every enrichment wants while the dimension
    fits an executor.  For a dimension too large to broadcast, pass
    False and pre-bucket BOTH sides on the join key so the per-batch
    shuffle is co-located.  `how` supports inner/left (stream side must
    stay the left side — Structured Streaming forbids right/full outer
    against a stream)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("stream-static joins support inner/left only "
                         "(the static side cannot drive outer rows)")
    d = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(d, on, how)


def eval_fingerprints(eval_docs: DataFrame, n: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The distinct eval-set n-gram fingerprint table (fp) — the static
    side stream_decontaminate broadcasts.  Materialize it once (it's tiny
    next to any corpus) and reuse across micro-batches."""
    from hugegraph_on_tikv_spark.functions.dedup import word_shingles

    return (eval_docs.select(
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n)))
        .alias("gram"))
        .select(F.md5(F.col("gram")).alias("fp"))
        .distinct())


def stream_decontaminate(spark, docs_dir: str, eval_fps: DataFrame,
                         checkpoint_dir: str, sink, schema: str,
                         n: int = 8, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Streaming face of dedup.decontaminate (strict policy): drop any
    streamed document sharing at least one verbatim n-gram with the eval
    set.  Decontamination is PER-DOCUMENT — no cross-batch state exists by
    problem structure — so the streaming form is a foreachBatch pipeline
    (the stream_upsert pattern): each micro-batch explodes its docs'
    grams, semi-joins the broadcast fingerprint table to find contaminated
    ids, anti-joins them away, and hands the survivors to `sink(batch_df,
    batch_id)`.  The eval side is a static DataFrame re-planned per batch,
    so a refreshed eval table is picked up without restarting the query.
    A per-batch aggregation-free plan also means this composes with any
    downstream stateful stage.

    Batch equivalence: running the same per-batch body over the whole
    corpus at once IS dedup.decontaminate's strict mode (equality-tested).
    """
    from hugegraph_on_tikv_spark.functions.dedup import word_shingles

    def _clean(batch_df: DataFrame, batch_id: int) -> None:
        grams = (batch_df.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), n)))
            .alias("gram"))
            .select(id_col, F.md5(F.col("gram")).alias("fp")))
        bad = grams.join(F.broadcast(eval_fps), "fp")             .select(id_col).distinct()
        sink(batch_df.join(bad, id_col, "left_anti"), batch_id)

    return (spark.readStream.schema(schema).parquet(docs_dir)
            .writeStream.foreachBatch(_clean)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
