"""Event-time windowing (SURVEY.md §2.9 / §7 phase 5).

The reference has no streaming operators (its only time semantic is KV TTL,
TikvTable.java:95-96); these are the Spark-native extensions the north star
asks for.  Each window shape exists twice:

* a batch form over the `events` DataFrame (used by the correctness oracle —
  DuckDB can replicate it exactly), and
* the structured-streaming form (readStream + withWatermark) sharing the
  same aggregation expressions, run with Trigger.AvailableNow in tests.

Window alignment is Spark's epoch-aligned `F.window`, which DuckDB matches
with time_bucket — both align to 1970-01-01 00:00:00 UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (window, event_type) counts + value sums."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-based).  Batch form; the streaming twin
    uses the same F.session_window with a watermark."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_tumbling_counts(spark, events_path: str, checkpoint_dir: str,
                           width: str = "1 hour", watermark: str = "10 minutes"):
    """Structured-streaming twin of tumbling_counts: file-source readStream →
    watermark → windowed agg.  Returns the StreamingQuery writing to an
    in-memory sink named 'tumbling_counts' (tests drain it with
    Trigger.AvailableNow and compare against the batch form)."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_path)
        # watermarks require an instant TIMESTAMP column (not NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    return (
        stream.writeStream.format("memory")
        .queryName("tumbling_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_tumbling_append(spark, events_dir: str, checkpoint_dir: str,
                           width: str = "1 hour", watermark: str = "30 minutes",
                           sink=None):
    """Append-mode tumbling counts: rows are emitted only when the watermark
    closes a window, and late events behind the watermark are DROPPED — the
    semantics a 100 TB streaming pipeline relies on to bound state.

    Run with availableNow twice against the same checkpoint (the watermark
    and window state persist between runs) to observe: (1) closed windows
    emit exactly once; (2) an event arriving after its window's close is
    discarded rather than re-emitting the window.

    `sink(batch_df, batch_id)` receives each emitted micro-batch via
    foreachBatch (the memory sink can't recover from a checkpoint, and
    resumability is the point of this operator)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    sink = sink or (lambda df, bid: None)
    return (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def resample_gapfill(events: DataFrame, interval: str = "1 hour",
                     ts_col: str = "ts", value_col: str = "value",
                     group_col: str = "event_type",
                     forward_fill: bool = False) -> DataFrame:
    """Regular-grid resampling with EXPLICIT empty buckets — the
    timeseries densification step plain groupBy(window) skips: a bucket
    with no events is absent from an aggregate but present on a chart /
    model input grid.  The dense spine is the global [min, max] bucket
    range crossed with the distinct group set; observed aggregates left-
    join onto it, empty buckets land with n_events = 0 and NULL sum.

    `forward_fill=True` adds `filled_value`: the last non-NULL sum at or
    before each bucket per group (`last(ignorenulls) OVER (ORDER BY
    bucket)` — the standard gap-carry for sensor/price series).

    Scale: the spine is built from a 1-row min/max aggregate (broadcast)
    exploded into n_buckets rows × distinct groups — the dense output's
    own size, nothing larger; the only shuffles are the bucket aggregate
    and (when forward-filling) one per-group window, both on the same
    key.  Returns (bucket_start, group_col, n_events, sum_value
    [, filled_value])."""
    from pyspark.sql.window import Window

    b = (events.groupBy(F.window(ts_col, interval).alias("w"),
                        F.col(group_col).alias("_grp"))
         .agg(F.count(F.lit(1)).alias("n_events"),
              F.round(F.sum(value_col), 4).alias("sum_value"))
         .select(F.col("w.start").alias("bucket_start"), "_grp",
                 "n_events", "sum_value"))
    mm = b.agg(F.min("bucket_start").alias("lo"),
               F.max("bucket_start").alias("hi"))
    spine = (mm.select(F.explode(F.expr(
        f"sequence(lo, hi, interval {interval})")).alias("bucket_start"))
        .crossJoin(b.select("_grp").distinct()))
    out = (spine.join(b, ["bucket_start", "_grp"], "left")
           .select("bucket_start", F.col("_grp").alias(group_col),
                   F.coalesce("n_events", F.lit(0).cast("long"))
                   .alias("n_events"),
                   "sum_value"))
    if forward_fill:
        w = (Window.partitionBy(group_col).orderBy("bucket_start")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = out.withColumn(
            "filled_value", F.last("sum_value", ignorenulls=True).over(w))
    return out


def resample_interpolate(events: DataFrame, interval: str = "1 hour",
                         ts_col: str = "ts", value_col: str = "value",
                         group_col: str = "event_type") -> DataFrame:
    """Linear interpolation over the dense resample grid: gap buckets get
    v0 + (v1−v0)·(p−p0)/(p1−p0) between the surrounding observed sums
    (leading/trailing gaps carry the nearest observed value — the standard
    sensor-series completion).  Built on resample_gapfill's spine; the
    interpolation is ONE row-local expression over window-located
    neighbors (last/first ignorenulls over the same per-group ordering the
    fill uses — no extra shuffle beyond the fill's window), so the arith
    is per-row deterministic and engine-portable.
    Returns (bucket_start, group_col, n_events, sum_value, interp_value)."""
    from pyspark.sql.window import Window

    base = resample_gapfill(events, interval, ts_col, value_col, group_col)
    wp = (Window.partitionBy(group_col).orderBy("bucket_start")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy(group_col).orderBy("bucket_start")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    pos = F.row_number().over(
        Window.partitionBy(group_col).orderBy("bucket_start"))
    obs_pos = F.when(F.col("sum_value").isNotNull(), F.col("_pos"))
    out = (base.withColumn("_pos", pos)
           .withColumn("_pv", F.last("sum_value", ignorenulls=True).over(wp))
           .withColumn("_pp", F.last(obs_pos, ignorenulls=True).over(wp))
           .withColumn("_nv", F.first("sum_value", ignorenulls=True).over(wn))
           .withColumn("_np", F.first(obs_pos, ignorenulls=True).over(wn)))
    # Exact-rational form: sums are round(·, 4) values, so scaled by 1e4
    # they are integers; the blend numerator/denominator are then exact
    # integer arithmetic — order- and engine-independent, which the float
    # blend is NOT (a midpoint of two 4dp values lands exactly on the
    # round-half boundary, where Spark and DuckDB round() disagree).
    # interp_value = interp_num / (interp_den * 1e4).
    pv_i = F.round(F.col("_pv") * 10000).cast("long")
    nv_i = F.round(F.col("_nv") * 10000).cast("long")
    sv_i = F.round(F.col("sum_value") * 10000).cast("long")
    num = (
        F.when(F.col("sum_value").isNotNull(), sv_i)
        .when(F.col("_pv").isNull(), nv_i)
        .when(F.col("_nv").isNull(), pv_i)
        .otherwise(pv_i * (F.col("_np") - F.col("_pos"))
                   + nv_i * (F.col("_pos") - F.col("_pp"))))
    den = (
        F.when(F.col("sum_value").isNotNull()
               | F.col("_pv").isNull() | F.col("_nv").isNull(), F.lit(1))
        .otherwise(F.col("_np") - F.col("_pp"))).cast("long")
    return out.select(
        "bucket_start", group_col, "n_events", "sum_value",
        num.alias("interp_num"), den.alias("interp_den"),
        (num / (den * F.lit(10000.0))).alias("interp_value"))
