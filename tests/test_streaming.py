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
