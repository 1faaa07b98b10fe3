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


# -- transformWithState sessionization --------------------------------------
# The arbitrary-state successor API (Spark 4 transformWithStateInPandas):
# typed state variables + event-time TIMERS, which applyInPandasWithState
# cannot express (its timeouts are per-key and implicit).  The operator —
# gap-based sessionization emitting CLOSED sessions exactly once — is the
# canonical shape that needs timers: a session can only close when the
# WATERMARK passes last_event + gap, not when any particular batch arrives.
# Built-in F.session_window covers count/sum aggs (windows.session_windows
# is the batch twin this operator is tested against); the processor form is
# the extension seam for session payloads the built-in can't carry
# (per-session event lists, CEP-style transitions, online models).

SESSION_OUTPUT_SCHEMA = ("user_id long, session_start timestamp, "
                         "session_end timestamp, n_events long, "
                         "total_value double")

# open sessions per user; [start, last] event-time millis
_SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def _merge_sessions(sessions: list[tuple], gap_ms: int) -> list[tuple]:
    """Merge session intervals ([start, last+gap) overlap ⇒ same session),
    exactly F.session_window's merge rule.  Pure function for testability."""
    out: list[list] = []
    for s in sorted(sessions):
        if out and s[0] <= out[-1][1] + gap_ms:
            out[-1][1] = max(out[-1][1], s[1])
            out[-1][2] += s[2]
            out[-1][3] += s[3]
        else:
            out.append(list(s))
    return [tuple(s) for s in out]


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class SessionProcessor(StatefulProcessor):
    """StatefulProcessor: gap-based sessions with event-time timers.

    State: a ListState of open sessions (out-of-order events inside the
    watermark can open a session BEHIND the current one, so a single value
    state would mis-merge).  One timer is kept at min(last)+gap over open
    sessions; on expiry every session whose last+gap <= watermark closes
    and is emitted exactly once, and the timer re-arms for the rest."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", _SESSION_STATE_SCHEMA)

    def close(self) -> None:
        pass

    def _rearm(self, sessions: list[tuple]) -> None:
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if sessions:
            self._handle.registerTimer(
                min(s[1] for s in sessions) + self._gap_ms)

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        incoming = []
        for pdf in rows:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            vals = pdf["value"].astype(float).tolist()
            incoming.extend((t, t, 1, v) for t, v in zip(ts_ms, vals))
        merged = _merge_sessions(
            list(self._sessions.get()) + incoming, self._gap_ms)
        self._sessions.put(merged)
        self._rearm(merged)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        wm = timerValues.getCurrentWatermarkInMs()
        sessions = list(self._sessions.get())
        closed = [s for s in sessions if s[1] + self._gap_ms <= wm]
        still_open = [s for s in sessions if s[1] + self._gap_ms > wm]
        if still_open:
            self._sessions.put(still_open)
        else:
            self._sessions.clear()
        self._rearm(still_open)
        if not closed:
            return iter(())
        return iter([pd.DataFrame({
            "user_id": [key[0]] * len(closed),
            "session_start": [pd.Timestamp(s[0], unit="ms") for s in closed],
            # session_window's end = last event + gap; mirror it
            "session_end": [pd.Timestamp(s[1] + self._gap_ms, unit="ms")
                            for s in closed],
            "n_events": [s[2] for s in closed],
            "total_value": [round(s[3], 4) for s in closed],
        })])


def stream_sessionize(spark: SparkSession, events_dir: str, checkpoint_dir: str,
                      gap: str = "5 minutes", watermark: str = "10 minutes",
                      sink=None):
    """Closed-session stream via transformWithStateInPandas: one output row
    per (user, session), emitted when the watermark passes the session's
    last event + gap — exactly-once by construction (the closing timer
    fires once; state for the session is dropped at emission).

    transformWithState requires the RocksDB state store provider (the state
    rows are schema'd and range-scanned); set per-session, which a plain
    HDFS-backed provider deployment should scope to the query.

    ENVIRONMENT GATE: the transformWithState state-server protocol speaks
    protobuf between the JVM and the Python worker; on images without the
    `protobuf` package the query's driver worker crashes opaquely, so fail
    fast with the real reason instead.  The processor itself is pure
    Python over pandas batches and is tested directly against the batch
    F.session_window twin (tests/test_streaming.py)."""
    import re as _re

    try:
        from google.protobuf import descriptor as _  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` package "
            "(pyspark's state-server protocol); not available in this "
            "environment") from exc

    m = _re.match(r"(\d+)\s*minute", gap)
    gap_ms = int(m.group(1)) * 60_000
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(gap_ms), SESSION_OUTPUT_SCHEMA,
            outputMode="append", timeMode="eventTime",
        )
    )
    sink = sink or (lambda df, bid: None)
    return (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
