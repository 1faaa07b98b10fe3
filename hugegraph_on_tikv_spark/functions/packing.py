"""Sequence packing — the last mile of a training-data pipeline.

After dedup / quality / sampling, documents are concatenated and cut into
fixed-length token windows ("packing", GPT-style): every training sequence
is exactly `seq_len` tokens, documents crossing a boundary continue in the
next sequence.  The operator here computes each document's PLACEMENT
(which sequences it lands in, at what offset) as pure deterministic
column arithmetic, so the actual byte-moving pack step can run
embarrassingly parallel afterwards.

Scale design: a single global concatenation order would need a global sort
and a single cumulative sum — the classic non-scalable window.  Instead
documents are hash-assigned to `shards` (pure column expression, no
shuffle beyond the window's own), and the concatenation order is
(shard, doc_id): each shard packs independently — the window's cumulative
sum shuffles by shard and sorts only within shards, and at 100 TB you
raise `shards` so each stays executor-sized.  Sequence ids are globally
unique via (shard, seq_in_shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions.hashing import md5_long48
from hugegraph_on_tikv_spark.functions.text import bpe_token_estimate


def pack_sequences(docs: DataFrame, seq_len: int = 2048, shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Placement of each document in the packed token stream.

    Returns (doc_id, shard, n_tokens, start_seq, end_seq, offset_in_seq):
    the document's tokens occupy positions [cum−n, cum) of its shard's
    concatenated stream, so it starts in sequence `start_seq` at offset
    `offset_in_seq` and ends in `end_seq` (== start_seq when it fits in
    one window; an empty document degenerates to a zero-width span).
    All arithmetic is exact integers — the same numbers fall out of any
    engine, which is what makes the placement auditable."""
    n_tok = bpe_token_estimate(F.col(text_col))
    w = Window.partitionBy("shard").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = (
        docs.select(
            F.col(id_col),
            F.pmod(md5_long48(F.col(id_col)), F.lit(shards)).alias("shard"),
            n_tok.cast("long").alias("n_tokens"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .withColumn("_start", F.col("_cum") - F.col("n_tokens"))
    )
    return base.select(
        id_col, "shard", "n_tokens",
        F.floor(F.col("_start") / seq_len).alias("start_seq"),
        F.when(F.col("n_tokens") == 0, F.floor(F.col("_start") / seq_len))
        .otherwise(F.floor((F.col("_cum") - 1) / seq_len)).alias("end_seq"),
        F.pmod(F.col("_start"), F.lit(seq_len)).alias("offset_in_seq"),
    )


def pack_token_ids(enc: DataFrame, seq_len: int = 2048,
                   shards: int = 8,
                   order: DataFrame | None = None) -> DataFrame:
    """MATERIALIZE the packed training stream from a real token-id stream
    (`bpe.bpe_encode` output: doc_id, wpos, spos, token_id) — one row per
    training-token slot:

        (doc_id, shard, seq, slot, token_id)

    where (shard, seq) is the globally-unique training-sequence key and
    slot ∈ [0, seq_len).  Documents concatenate in (shard, doc_id) order
    and run across sequence boundaries, GPT-style — `pack_sequences`
    computes the same placement from the token ESTIMATE; this computes
    the exact stream from the ids the tokenizer actually emitted.

    Scale shape: the per-shard cumulative sum is the pack_sequences
    contract (shuffle by shard, sort within shard — raise `shards` until
    each is executor-sized); the within-document token rank is a window
    partitioned BY DOCUMENT (bounded partitions); the only corpus-sized
    join is enc ⋈ placement, co-keyed on doc_id with a doc-count-sized
    right side.

    `order` (opt-in, (doc_id, shard, pos)) overrides the hash-shard /
    doc_id concatenation order — the hook that lets an EPOCH SHUFFLE
    (sampling.training_order's output) decide what the packed stream
    reads like; docs absent from `order` are excluded (it defines the
    corpus being assembled).  Same per-shard cumsum, same scale shape."""
    cnt = enc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if order is None:
        keyed = cnt.withColumn(
            "shard", F.pmod(md5_long48(F.col("doc_id")), F.lit(shards)))
        okey = "doc_id"
    else:
        keyed = cnt.join(order.select("doc_id", "shard", "pos"), "doc_id")
        okey = "pos"
    w = Window.partitionBy("shard").orderBy(okey) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    placed = keyed.withColumn("_start", F.sum("n").over(w) - F.col("n"))
    wd = Window.partitionBy("doc_id").orderBy("wpos", "spos")
    g = (enc.join(placed.select("doc_id", "shard", "_start"), "doc_id")
         .withColumn("_g", F.col("_start") + F.row_number().over(wd) - 1))
    return g.select(
        "doc_id", "shard",
        F.floor(F.col("_g") / seq_len).cast("long").alias("seq"),
        F.pmod(F.col("_g"), F.lit(seq_len)).alias("slot"),
        "token_id",
    )
