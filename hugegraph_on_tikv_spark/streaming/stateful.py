"""Custom stateful streaming operators (SURVEY.md §2.9 north star).

`applyInPandasWithState` is the Spark-native escape hatch when the built-in
windowed aggregations can't express the semantics: per-key state lives in
the state store (checkpointed, recoverable, RocksDB-backed on a cluster)
and each micro-batch updates it through an Arrow-batched pandas function.

The operator here — running per-user totals that survive across
micro-batches and restarts — is deliberately simple: the point under test
is the state plumbing (schema, timeout config, checkpoint recovery), which
is identical for any richer operator (custom sessionization, CEP-style
pattern state, online reservoir samples).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update_totals(key: Any, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [round(total, 4)],
    })


def stream_running_totals(spark: SparkSession, events_dir: str, checkpoint_dir: str,
                          sink=None):
    """Per-user running (count, sum(value)) maintained in keyed state across
    micro-batches; each batch emits the updated totals for the users it
    touched.  State persists in the checkpoint — a second availableNow run
    continues from the previous totals instead of recounting.

    `sink(batch_df, batch_id)` receives each micro-batch via foreachBatch
    (checkpoint-recoverable, unlike the memory sink)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout,
        )
    )
    sink = sink or (lambda df, bid: None)
    return (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
