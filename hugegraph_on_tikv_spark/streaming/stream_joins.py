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


def ntz_as_utc_instant(col):
    """Instant (TIMESTAMP) for an NTZ wall time read AS UTC.

    Watermarks require an instant-typed column, but a plain
    `.cast("timestamp")` interprets the wall time in the SESSION timezone —
    non-linear across that zone's DST transitions (an hour repeats or
    vanishes), so event pairs straddling a transition could shift their
    relative lag by 3600s and flip join-window membership vs the NTZ-based
    batch twin.  This derivation is pure epoch arithmetic (days × 86400e6 +
    time-of-day micros), linear in the wall clock under every session
    timezone — the stream and the batch twin agree on ANY data."""
    days = F.unix_date(col.cast("date")).cast("long")
    micros = (
        days * 86_400_000_000
        + F.hour(col).cast("long") * 3_600_000_000
        + F.minute(col).cast("long") * 60_000_000
        + (F.date_part(F.lit("SECOND"), col) * 1_000_000).cast("long")
    )
    return F.timestamp_micros(micros)


def attribution_join(clicks: DataFrame, views: DataFrame,
                     within: str = "10 minutes") -> DataFrame:
    """Batch twin: (click_id, view_id, user_id, lag_us) for every view by
    the same user in [click_ts - within, click_ts].  Lag is measured in
    microseconds (the timestamps' own precision) so engines that count
    boundary crossings and engines that count complete units agree.

    Exact baseline BY CONTRACT (mirrors cosine_topk's framing): the plan is
    a per-user equi-join BEFORE the time filter, i.e. all click×view pairs
    of each user are enumerated — quadratic in a single user's event count,
    so a power-law user (bot traffic) dominates the stage.  This form exists
    as the SQL-expressible oracle twin; the production path on unbounded or
    skewed data is `stream_attribution_join`, whose state is bounded by
    watermarks.  (A batch deployment hitting the skew case should pre-bucket
    both sides by (user_id, time_bucket(within)) and join on that pair.)"""
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


def attribution_join_outer(clicks: DataFrame, views: DataFrame,
                           within: str = "10 minutes") -> DataFrame:
    """LEFT-OUTER batch twin: every click, with NULL view columns when no
    view fell in its window — the unmatched rows are exactly what a
    conversion-funnel pipeline counts (clicks with no preceding impression).
    Same per-user equi-join contract as attribution_join; the outer
    condition must live in the join ON clause (a post-filter would turn the
    outer join back into an inner one)."""
    c = clicks.select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts"))
    v = views.select(F.col("event_id").alias("view_id"),
                     F.col("user_id").alias("v_user_id"),
                     F.col("ts").alias("view_ts"))
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {within}"))
    )
    return (
        c.join(v, cond, "left")
        .select("click_id", "view_id", "user_id",
                F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)").alias("lag_us"))
    )


def attribution_join_full(clicks: DataFrame, views: DataFrame,
                          within: str = "10 minutes") -> DataFrame:
    """FULL-OUTER batch twin: matched pairs, clicks with no view in their
    window (NULL view columns), AND views that attributed to no click
    (NULL click columns) — the second NULL class is the impression-waste
    side of the funnel (paid views that never converted).  user_id is
    coalesced across sides so every row keeps its key.  Completes the
    inner/leftOuter/fullOuter interval-join family; same per-user
    equi-join contract as attribution_join."""
    c = clicks.select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts"))
    v = views.select(F.col("event_id").alias("view_id"),
                     F.col("user_id").alias("v_user_id"),
                     F.col("ts").alias("view_ts"))
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {within}"))
    )
    return (
        c.join(v, cond, "full")
        .select("click_id", "view_id",
                F.coalesce(F.col("user_id"), F.col("v_user_id"))
                .alias("user_id"),
                F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)")
                .alias("lag_us"))
    )


def stream_attribution_join(spark: SparkSession, clicks_dir: str, views_dir: str,
                            checkpoint_dir: str, sink,
                            within: str = "10 minutes",
                            watermark: str = "30 minutes",
                            how: str = "inner"):
    """Streaming form over two parquet file-streams.  Both sides carry a
    watermark and the join predicate bounds view_ts to a window ending at
    click_ts, so Spark can drop view state older than
    (max click watermark - within) and click state as batches complete.
    `sink(batch_df, batch_id)` receives results via foreachBatch
    (checkpoint-recoverable); triggered availableNow.

    `how='leftOuter'` emits unmatched clicks with NULL view columns — but
    only once the VIEW-side watermark has passed the click's window (the
    earliest moment no future view can still match), which is Spark's
    outer-join state-expiry contract.  Consequence for finite runs: a
    trailing click's NULL row is emitted only after a LATER event advances
    the watermark past it — an unbounded stream does this naturally; a
    drained one needs a subsequent trigger with later data (see the
    two-trigger equality test).  State stays O(watermark window) exactly as
    in the inner form."""
    # the watermark/join-bound column is a DST-safe treat-NTZ-as-UTC instant
    # (see ntz_as_utc_instant); the original NTZ columns ride along so the
    # emitted lag is computed on the same values as the batch twin
    c = (spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
         .withColumn("wts", ntz_as_utc_instant(F.col("ts")))
         .withWatermark("wts", watermark)
         .select(F.col("event_id").alias("click_id"), "user_id",
                 F.col("ts").alias("click_ts"), F.col("wts").alias("click_wts")))
    v = (spark.readStream.schema(EVENT_SCHEMA).parquet(views_dir)
         .withColumn("wts", ntz_as_utc_instant(F.col("ts")))
         .withWatermark("wts", watermark)
         .select(F.col("event_id").alias("view_id"),
                 F.col("user_id").alias("v_user_id"),
                 F.col("ts").alias("view_ts"), F.col("wts").alias("view_wts")))
    # fullOuter additionally emits never-matched VIEWS (NULL click columns)
    # on click-side watermark expiry; their user_id comes from the view side
    uid = (F.coalesce(F.col("user_id"), F.col("v_user_id")).alias("user_id")
           if how == "fullOuter" else F.col("user_id"))
    joined = (
        c.join(
            v,
            F.expr(f"""
                user_id = v_user_id AND
                view_wts <= click_wts AND
                view_wts >= click_wts - INTERVAL {within}
            """),
            how,
        )
        .select("click_id", "view_id", uid,
                F.expr("timestampdiff(MICROSECOND, view_ts, click_ts)").alias("lag_us"))
    )
    return (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
