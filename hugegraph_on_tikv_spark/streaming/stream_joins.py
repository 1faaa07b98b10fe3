"""Stream-stream joins (SURVEY.md §2.9 — Spark-native extension).

The canonical shape: attribute each click to the views the same user made
in the preceding interval.  Exists twice, like every streaming operator
here:

* `attribution_join` — the batch twin over two event DataFrames, exactly
  reproducible in ANSI SQL (the driver's correctness oracle);
* `stream_attribution_join` — the structured-streaming form: both sides
  watermarked, the join condition carries the event-time bound Spark needs
  to expire join state.  Without that bound the join buffers BOTH streams
  forever; with it, state is O(watermark-window of events), which is what
  makes the operator viable on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                "event_type string, value double, props string")


def attribution_join(clicks: DataFrame, views: DataFrame,
                     within: str = "10 minutes") -> DataFrame:
    """Batch twin: (click_id, view_id, user_id, lag_us) for every view by
    the same user in [click_ts - within, click_ts].  Lag is measured in
    microseconds (the timestamps' own precision) so engines that count
    boundary crossings and engines that count complete units agree."""
    c = clicks.select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts"))
    v = views.select(F.col("event_id").alias("view_id"), "user_id",
                     F.col("ts").alias("view_ts"))
    return (
        c.join(v, "user_id")
        .filter((F.col("view_ts") <= F.col("click_ts"))
                & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {within}")))
        .select("click_id", "view_id", "user_id",
                F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)").alias("lag_us"))
    )


def stream_attribution_join(spark: SparkSession, clicks_dir: str, views_dir: str,
                            checkpoint_dir: str, sink,
                            within: str = "10 minutes",
                            watermark: str = "30 minutes"):
    """Streaming form over two parquet file-streams.  Both sides carry a
    watermark and the join predicate bounds view_ts to a window ending at
    click_ts, so Spark can drop view state older than
    (max click watermark - within) and click state as batches complete.
    `sink(batch_df, batch_id)` receives results via foreachBatch
    (checkpoint-recoverable); triggered availableNow."""
    # watermarks require an instant TIMESTAMP column (not NTZ); the cast is
    # session-TZ-relative but both sides shift identically, so the join
    # window and microsecond lags are unaffected
    c = (spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark)
         .select(F.col("event_id").alias("click_id"), "user_id",
                 F.col("ts").alias("click_ts")))
    v = (spark.readStream.schema(EVENT_SCHEMA).parquet(views_dir)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark)
         .select(F.col("event_id").alias("view_id"),
                 F.col("user_id").alias("v_user_id"),
                 F.col("ts").alias("view_ts")))
    joined = (
        c.join(
            v,
            F.expr(f"""
                user_id = v_user_id AND
                view_ts <= click_ts AND
                view_ts >= click_ts - INTERVAL {within}
            """),
        )
        .select("click_id", "view_id", "user_id",
                F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)").alias("lag_us"))
    )
    return (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
