"""Structured-streaming twin: the readStream windowed aggregation must agree
with the batch form (SURVEY.md §7 phase 5)."""

from __future__ import annotations

import tempfile

from hugegraph_on_tikv_spark.sources.catalog import load_events
from hugegraph_on_tikv_spark.streaming import windows


def test_stream_tumbling_equals_batch(spark):
    # the events fixture carries nano timestamps the stream reader can't use
    # directly; write a micro-precision copy for the file source
    with tempfile.TemporaryDirectory() as tmp:
        events_dir = f"{tmp}/events"
        load_events(spark, "/root/testdata/sf0.001").write.parquet(events_dir)

        q = windows.stream_tumbling_counts(spark, events_dir, f"{tmp}/ckpt")
        q.awaitTermination(120)

        streamed = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in spark.table("tumbling_counts").collect()
        }
        batch = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in windows.tumbling_counts(
                spark.read.parquet(events_dir), "1 hour"
            ).collect()
        }
    assert streamed == batch
    assert len(streamed) > 0


def test_multimodal_features(spark):
    from hugegraph_on_tikv_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, 12)
    feats = extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] == 256
    # deterministic across runs
    feats2 = extract_features(media).collect()
    assert sorted(r["media_id"] for r in feats) == sorted(r["media_id"] for r in feats2)

    frames = frame_sample_plan(media, every_ms=1000)
    assert frames.count() > 0


def test_stream_upsert_into_catalog(spark, tmp_path):
    from hugegraph_on_tikv_spark.sources.catalog import load_events
    from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog
    from hugegraph_on_tikv_spark.streaming.ingest import stream_upsert

    events = load_events(spark, "/root/testdata/sf0.001")
    events_dir = str(tmp_path / "events")
    events.write.parquet(events_dir)

    catalog = TableCatalog(spark, str(tmp_path / "store"))
    catalog.create_table("events_live", events.limit(0), key="event_id")

    stream = spark.readStream.schema(
        spark.read.parquet(events_dir).schema
    ).option("maxFilesPerTrigger", 1).parquet(events_dir)
    q = stream_upsert(stream, catalog, "events_live", "event_id",
                      str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    n_expected = events.select("event_id").distinct().count()
    assert catalog.table("events_live").df.count() == n_expected

    # idempotency: replay the same data through a fresh stream+checkpoint
    q2 = stream_upsert(
        spark.readStream.schema(spark.read.parquet(events_dir).schema).parquet(events_dir),
        catalog, "events_live", "event_id", str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert catalog.table("events_live").df.count() == n_expected


def test_session_window_stream_twin(spark, tmp_path):
    """Streaming session windows (stateful agg) equal the batch form."""
    from pyspark.sql import functions as F
    from hugegraph_on_tikv_spark.sources.catalog import load_events
    from hugegraph_on_tikv_spark.streaming import windows

    events_dir = str(tmp_path / "ev")
    load_events(spark, "/root/testdata/sf0.001").write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )
    q = (
        stream.writeStream.format("memory").queryName("sessions_stream")
        .outputMode("complete").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    streamed = {
        (str(r["session_start"]), r["user_id"]): r["n_events"]
        for r in spark.table("sessions_stream").collect()
    }
    batch_df = windows.session_windows(
        spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp")),
        "5 minutes",
    )
    batch = {
        (str(r["session_start"]), r["user_id"]): r["n_events"] for r in batch_df.collect()
    }
    assert streamed == batch and len(streamed) > 0
