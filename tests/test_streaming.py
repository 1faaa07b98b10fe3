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


def test_binary_file_ingest_end_to_end(spark, tmp_path):
    """Real files on disk → binaryFile source → MEDIA_SCHEMA → feature
    extraction and resize, codec-free: the whole ingest half of the
    multimodal pipeline with only `_decode_stub` fake."""
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        extract_features,
        frame_sample_plan,
        ingest_binary_files,
        resize_images,
    )

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    payloads = {}
    for i in range(3):
        body = bytes((i * 37 + j) % 251 for j in range(200))
        (img_dir / f"img{i}_10x10.gray").write_bytes(body)
        payloads[f"img{i}"] = body
    media = ingest_binary_files(spark, str(img_dir), "image", glob="*.gray")
    # schema contract: exactly MEDIA_SCHEMA's names and types
    assert [(f.name, f.dataType) for f in media.schema.fields] == \
        [(f.name, f.dataType) for f in MEDIA_SCHEMA.fields]
    rows = media.collect()
    assert len(rows) == 3
    assert all(r["width"] == 10 and r["height"] == 10 for r in rows)
    assert all(r["mime"] == "image/gray" for r in rows)
    assert len({r["media_id"] for r in rows}) == 3  # md5-derived, distinct
    assert sorted(bytes(r["payload"]) for r in rows) == \
        sorted(payloads.values())  # payload bytes survive ingest untouched

    # features over the ingested payloads match a local numpy recompute
    feats = {bytes(r2["payload"]): None for r2 in rows}
    got = extract_features(media).collect()
    for r in got:
        assert r["n_bytes"] == 200
        assert len(r["feature"]) == FEATURE_DIM
    by_id = {r["media_id"]: r["feature"] for r in got}
    for r in rows:
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
        want = (hist / hist.sum()).astype(np.float32)
        assert np.allclose(by_id[r["media_id"]], want, atol=1e-6)

    # resize consumes the filename-parsed dims
    resized = resize_images(media, 4, 4).collect()
    assert len(resized) == 3 and all(len(bytes(r["payload"])) == 16 for r in resized)

    # audio/video: duration parses from the _NNNms convention and feeds the
    # frame-sample plan
    vid_dir = tmp_path / "videos"
    vid_dir.mkdir()
    (vid_dir / "clip_2500ms.fakemp4").write_bytes(b"\x00" * 64)
    vids = ingest_binary_files(spark, str(vid_dir), "video")
    v = vids.collect()[0]
    assert v["duration_ms"] == 2500 and v["width"] is None
    assert frame_sample_plan(vids, every_ms=1000).count() == 3  # 0,1000,2000


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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """stream_dedup over an at-least-once source (every event delivered
    twice, in two separate files) keeps exactly one row per event_id —
    equal to batch dropDuplicates — with watermark-bounded state."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.catalog import load_events
    from hugegraph_on_tikv_spark.streaming.ingest import stream_dedup
    from hugegraph_on_tikv_spark.streaming.stream_joins import ntz_as_utc_instant

    events = load_events(spark, "/root/testdata/sf0.001") \
        .select("event_id", "ts", "user_id", "event_type")
    src = str(tmp_path / "dup_src")
    events.write.mode("append").parquet(src)       # first delivery
    events.write.mode("append").parquet(src)       # full redelivery
    schema = spark.read.parquet(src).schema

    out_dir = str(tmp_path / "out")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(src)
              .withColumn("wts", ntz_as_utc_instant(F.col("ts"))))
    q = (stream_dedup(stream, ["event_id"], "wts", "30 minutes")
         .drop("wts")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == events.count()           # every duplicate dropped
    assert got.select("event_id").distinct().count() == events.count()
    # same multiset as the batch twin
    want = sorted(r["event_id"] for r in events.collect())
    assert sorted(r["event_id"] for r in got.collect()) == want


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


def test_watermark_append_drops_late_events(spark, tmp_path):
    """Append mode + watermark: a window emits once when the watermark
    passes its end, and an event arriving later than the watermark never
    re-opens it (state stays bounded — the 100 TB contract)."""
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.windows import stream_tumbling_append

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(events_dir)

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    # batch 1: three events in the 10:00 window + one at 12:00 that pushes
    # the watermark to 11:30, closing (and emitting) the 10:00 window
    write_batch([base, base + dt.timedelta(minutes=10),
                 base + dt.timedelta(minutes=20),
                 base + dt.timedelta(hours=2)])
    emitted1: list = []
    q = stream_tumbling_append(spark, events_dir, ckpt,
                               sink=lambda df, bid: emitted1.extend(df.collect()))
    q.awaitTermination(120)
    first = {r["window_start"]: r["n_events"] for r in emitted1}
    assert first[dt.datetime(2024, 3, 1, 10, 0, 0)] == 3

    # batch 2: a LATE event for the closed 10:00 window (behind the 11:30
    # watermark) plus one at 14:00 that closes the 12:00 window
    write_batch([base + dt.timedelta(minutes=30),
                 base + dt.timedelta(hours=4)])
    emitted2: list = []
    q2 = stream_tumbling_append(spark, events_dir, ckpt,
                                sink=lambda df, bid: emitted2.extend(df.collect()))
    q2.awaitTermination(120)
    second = {r["window_start"]: r["n_events"] for r in emitted2}
    # the 12:00 window emits with only its on-time event; the late 10:30
    # event is dropped — no re-emission of the 10:00 window
    assert second == {dt.datetime(2024, 3, 1, 12, 0, 0): 1}


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    """applyInPandasWithState: keyed state survives across micro-batch runs
    via the checkpoint — the second run continues from prior totals."""
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.stateful import stream_running_totals

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2024, 3, 1, 9, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(
            [(i, ts, uid, "click", v, "{}") for i, (uid, v) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(events_dir)

    write_batch([(1, 10.0), (1, 5.0), (2, 1.0)])
    rows1: list = []
    q = stream_running_totals(spark, events_dir, ckpt,
                              sink=lambda df, bid: rows1.extend(df.collect()))
    q.awaitTermination(120)
    r1 = {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows1}
    assert r1 == {1: (2, 15.0), 2: (1, 1.0)}

    write_batch([(1, 2.5), (3, 7.0)])
    rows2: list = []
    q2 = stream_running_totals(spark, events_dir, ckpt,
                               sink=lambda df, bid: rows2.extend(df.collect()))
    q2.awaitTermination(120)
    r2 = {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows2}
    # user 1 continues from checkpointed state; untouched user 2 not re-emitted
    assert r2 == {1: (3, 17.5), 3: (1, 7.0)}


def test_stream_edge_view_maintenance(spark, tmp_path):
    """Incremental graph-view maintenance: an edge stream upserts into a
    catalog-backed edge table keyed on the composite (src, dst, label);
    replayed edges are idempotent and queries see the merged adjacency."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog
    from hugegraph_on_tikv_spark.streaming.ingest import stream_upsert

    catalog = TableCatalog(spark, str(tmp_path / "cat"))
    initial = spark.createDataFrame(
        [(1, 10, "knows", 0.1), (1, 11, "knows", 0.2)],
        "src long, dst long, label string, weight double",
    )
    catalog.create_table("edges_live", initial, key=["src", "dst", "label"])

    stream_dir = str(tmp_path / "stream")
    # batch contains: a replay of (1,10) with a new weight (upsert wins),
    # a duplicate row inside the batch, and two brand-new edges
    spark.createDataFrame(
        [(1, 10, "knows", 0.9), (1, 10, "knows", 0.9),
         (2, 10, "knows", 0.5), (1, 12, "likes", 0.3)],
        "src long, dst long, label string, weight double",
    ).coalesce(1).write.mode("append").parquet(stream_dir)

    schema = spark.read.parquet(stream_dir).schema
    q = stream_upsert(
        spark.readStream.schema(schema).parquet(stream_dir),
        catalog, "edges_live", ["src", "dst", "label"],
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    rows = {(r["src"], r["dst"], r["label"]): r["weight"]
            for r in catalog.table("edges_live").df.collect()}
    assert rows == {
        (1, 10, "knows"): 0.9,   # replayed edge upserted
        (1, 11, "knows"): 0.2,   # untouched edge survives
        (2, 10, "knows"): 0.5,
        (1, 12, "likes"): 0.3,
    }


def test_stream_stream_attribution_join(spark, tmp_path):
    """Stream-stream interval join: the watermarked streaming join must
    produce exactly the batch twin's rows (clicks × prior views within 10
    minutes per user)."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.streaming import stream_joins

    ev = load_events(spark, "/root/testdata/sf0.001")
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "view").write.parquet(views_dir)

    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
            for r in batch_df.collect()
        )

    q = stream_joins.stream_attribution_join(
        spark, clicks_dir, views_dir, str(tmp_path / "ckpt"), sink)
    q.awaitTermination(120)

    want = [
        (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
        for r in stream_joins.attribution_join(
            spark.read.parquet(clicks_dir), spark.read.parquet(views_dir)
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(want) > 0


def test_resize_images_nearest_neighbor(spark):
    """resize_images: the resample math is real (verified against a local
    numpy model on the same deterministic fake decode); every image lands
    at the target shape."""
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        _decode_pixels_stub,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 9)
    out = {r["media_id"]: r for r in resize_images(media, 16, 8).collect()}
    src = {r["media_id"]: r for r in media.filter("kind = 'image'").collect()}
    assert set(out) == set(src) and len(out) == 3
    for mid, r in out.items():
        assert (r["width"], r["height"]) == (16, 8)
        assert len(r["payload"]) == 16 * 8
        img = _decode_pixels_stub(bytes(src[mid]["payload"]), 64, 64)
        rows = (np.arange(8) * (64 / 8)).astype(np.int64)
        cols = (np.arange(16) * (64 / 16)).astype(np.int64)
        assert bytes(r["payload"]) == img[rows][:, cols].tobytes()


def test_media_byte_dedup_exact_and_near(spark):
    """Codec-free media dedup: exact byte-duplicate groups via hex-md5
    fingerprints; near-duplicates (appended-tail mutants) via byte-n-gram
    SimHash + the shared 4x12-bit banding."""
    from hugegraph_on_tikv_spark.functions.multimodal import (
        media_byte_simhash,
        media_exact_dup_groups,
        media_near_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, n=64, n_near=16, n_exact=8)

    # exact: each of the 8 copies pairs with its base; canonical = min id
    groups = {r["canonical_id"]: r["n_copies"]
              for r in media_exact_dup_groups(media).collect()}
    assert groups == {i: 2 for i in range(8)}

    # signatures: every payload >= 8 bytes gets one; exact copies get the
    # SAME signature as their base
    sigs = {r["media_id"]: r["simhash"]
            for r in media_byte_simhash(media).collect()}
    assert len(sigs) == 64 + 16 + 8
    for i in range(8):
        assert sigs[2000 + i] == sigs[i]

    # near pairs: every exact copy is a hamming-0 pair with its base, and
    # appended-tail mutants land within the loose media threshold for at
    # least some bases (partial recall beyond hamming 3 is by design)
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in media_near_pairs(media, max_hamming=8).collect()}
    for i in range(8):
        assert pairs[(i, 2000 + i)] == 0
    mutant_pairs = [h for (a, b), h in pairs.items()
                    if b == 1000 + a and 0 < h <= 8]
    assert len(mutant_pairs) >= 3
    # no false positives: unrelated bases never collide within hamming 8
    unrelated = [(a, b) for (a, b) in pairs
                 if not (b in (1000 + a, 2000 + a)
                         or (a >= 1000 and b == a + 1000))]
    assert unrelated == []


def test_media_byte_simhash_skips_null_and_short_payloads(spark):
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from hugegraph_on_tikv_spark.functions.multimodal import media_byte_simhash

    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("payload", BinaryType(), True),
    ])
    media = spark.createDataFrame(
        [(1, "image", None),
         (2, "image", bytearray(b"abc")),          # < 8 bytes
         (3, "image", bytearray(b"abcdefgh"))],    # exactly one n-gram
        schema)
    got = media_byte_simhash(media).collect()
    assert [r["media_id"] for r in got] == [3]


def test_stream_stream_outer_attribution_join(spark, tmp_path):
    """LEFT-OUTER stream-stream interval join: unmatched clicks emit NULL
    view rows once the watermark passes their window.  Finite-run recipe:
    trigger 1 drains the real data (inner matches emit; trailing NULLs are
    still held as state), then a far-future sentinel event lands and
    trigger 2 (same checkpoint) advances the watermark past every real
    click, flushing the NULL rows.  The union of both triggers' output must
    equal the batch outer twin exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.streaming import stream_joins

    ev = load_events(spark, "/root/testdata/sf0.001")
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "view").write.parquet(views_dir)

    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
            for r in batch_df.collect()
        )

    q = stream_joins.stream_attribution_join(
        spark, clicks_dir, views_dir, str(tmp_path / "ckpt"), sink,
        how="leftOuter")
    q.awaitTermination(180)

    # sentinel: one click+view pair for a user that does not exist in the
    # fixture, 2 hours past the max event time — advances both watermarks
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel_ts = max_ts + dt.timedelta(hours=2)
    sentinel = spark.createDataFrame(
        [(10**9, sentinel_ts, -1, "click", 0.0, "{}")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    sentinel.write.mode("append").parquet(clicks_dir)
    sentinel.withColumn("event_type", F.lit("view")) \
        .write.mode("append").parquet(views_dir)

    q2 = stream_joins.stream_attribution_join(
        spark, clicks_dir, views_dir, str(tmp_path / "ckpt"), sink,
        how="leftOuter")
    q2.awaitTermination(180)

    real = [t for t in got if t[2] != -1]
    want = [
        (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
        for r in stream_joins.attribution_join_outer(
            spark.read.parquet(clicks_dir).filter("user_id <> -1"),
            spark.read.parquet(views_dir).filter("user_id <> -1"),
        ).collect()
    ]
    assert sorted(real, key=str) == sorted(want, key=str)
    # the outer form really added NULL rows beyond the inner join's output
    nulls = [t for t in real if t[1] is None]
    assert len(nulls) > 0


class _FakeListState:
    def __init__(self):
        self.rows: list = []

    def get(self):
        return iter(list(self.rows))

    def put(self, rows):
        self.rows = list(rows)

    def clear(self):
        self.rows = []


class _FakeHandle:
    def __init__(self):
        self.state = _FakeListState()
        self.timers: set = set()

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return iter(sorted(self.timers))

    def registerTimer(self, t):
        self.timers.add(t)

    def deleteTimer(self, t):
        self.timers.discard(t)


class _FakeTimerValues:
    def __init__(self, wm):
        self._wm = wm

    def getCurrentWatermarkInMs(self):
        return self._wm


def _drive_session_processor(events_by_batch, gap_ms, final_wm_ms):
    """Run SessionProcessor's handleInputRows/handleExpiredTimer cycle the
    way the transformWithState runtime would (per key): feed each batch,
    then advance the watermark and fire due timers until quiescent."""
    import pandas as pd

    from hugegraph_on_tikv_spark.streaming.stateful import SessionProcessor

    out = []
    byuser: dict = {}
    for batch in events_by_batch:
        for uid, ts_ms, v in batch:
            byuser.setdefault(uid, []).append((ts_ms, v))
    for uid, evs in byuser.items():
        proc = SessionProcessor(gap_ms)
        handle = _FakeHandle()
        proc.init(handle)
        pdf = pd.DataFrame({
            "ts": pd.to_datetime([e[0] for e in evs], unit="ms"),
            "value": [e[1] for e in evs],
        })
        out.extend(proc.handleInputRows((uid,), iter([pdf]),
                                        _FakeTimerValues(-1)))
        # watermark jumps to final_wm_ms; fire timers as the runtime would
        while handle.timers and min(handle.timers) <= final_wm_ms:
            t = min(handle.timers)
            handle.timers.discard(t)
            out.extend(proc.handleExpiredTimer(
                (uid,), _FakeTimerValues(final_wm_ms), None))
    import itertools

    rows = list(itertools.chain.from_iterable(
        df.to_dict("records") for df in out))
    return rows


def test_session_processor_matches_batch_session_window(spark):
    """The transformWithState SessionProcessor's closed sessions equal the
    batch F.session_window twin on the same events (start, end, n_events),
    including out-of-order events and multi-session users.  (The full
    streaming query needs the protobuf state-server protocol, absent in
    this environment — the processor logic is the testable surface.)"""
    import datetime as dt

    from pyspark.sql import functions as F
    from hugegraph_on_tikv_spark.streaming import windows

    base = dt.datetime(2024, 3, 1, 9, 0, 0)
    base_ms = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    # user 1: two sessions (0-2 and 20-21 min); user 2: one session with an
    # out-of-order arrival (31 before 30); user 3: chained extension 0,4,8
    data = [(1, 0, 1.0), (1, 2, 2.0), (1, 20, 3.0), (1, 21, 4.0),
            (2, 31, 5.0), (2, 30, 6.0), (3, 0, 1.0), (3, 4, 1.0), (3, 8, 1.0)]
    gap_ms = 5 * 60_000
    rows = _drive_session_processor(
        [[(uid, base_ms + m * 60_000, v) for uid, m, v in data]],
        gap_ms, final_wm_ms=base_ms + 10**9)

    got = {(r["user_id"],
            str(r["session_start"]), str(r["session_end"])): r["n_events"]
           for r in rows}

    batch = windows.session_windows(
        spark.createDataFrame(
            [(uid, base + dt.timedelta(minutes=m), v) for uid, m, v in data],
            "user_id long, ts timestamp, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp")), "5 minutes")
    expected = {(r["user_id"],
                 str(r["session_start"]), str(r["session_end"])): r["n_events"]
                for r in batch.collect()}
    assert got == expected
    # payload the built-in agg doesn't carry: per-session sums
    sums = {}
    for r in rows:
        sums[r["user_id"]] = sums.get(r["user_id"], 0.0) + r["total_value"]
    assert sums == {1: 10.0, 2: 11.0, 3: 3.0}


def test_session_processor_partial_close_keeps_open_sessions():
    """A watermark between two sessions closes only the earlier one; the
    later session stays in state with a re-armed timer and closes on the
    next watermark advance (exactly-once: no re-emission)."""
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.stateful import SessionProcessor
    import pandas as pd

    base_ms = int(dt.datetime(2024, 3, 1, 9, 0, 0,
                              tzinfo=dt.timezone.utc).timestamp() * 1000)
    gap_ms = 5 * 60_000
    proc = SessionProcessor(gap_ms)
    handle = _FakeHandle()
    proc.init(handle)
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([base_ms, base_ms + 20 * 60_000], unit="ms"),
        "value": [1.0, 2.0],
    })
    assert list(proc.handleInputRows((7,), iter([pdf]),
                                     _FakeTimerValues(-1))) == []
    assert len(handle.state.rows) == 2

    # watermark past session 1's close, before session 2's
    wm1 = base_ms + 10 * 60_000
    t = min(handle.timers)
    handle.timers.discard(t)
    out1 = list(proc.handleExpiredTimer((7,), _FakeTimerValues(wm1), None))
    assert len(out1) == 1 and out1[0]["n_events"].tolist() == [1]
    assert len(handle.state.rows) == 1 and handle.timers

    wm2 = base_ms + 60 * 60_000
    t = min(handle.timers)
    handle.timers.discard(t)
    out2 = list(proc.handleExpiredTimer((7,), _FakeTimerValues(wm2), None))
    assert len(out2) == 1 and out2[0]["n_events"].tolist() == [1]
    assert handle.state.rows == [] and not handle.timers


def test_stream_sessionize_env_gate(spark, tmp_path):
    """Without the protobuf package the full streaming query must fail
    fast with the documented reason (not an opaque worker crash); with it,
    it must run end-to-end against the batch twin."""
    import pytest as _pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False
    if has_protobuf:
        _pytest.skip("protobuf present: covered by the full-stream path")
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.stateful import stream_sessionize

    events_dir = str(tmp_path / "events")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 9, 0, 0), 1, "c", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(events_dir)
    with _pytest.raises(NotImplementedError, match="protobuf"):
        stream_sessionize(spark, events_dir, str(tmp_path / "ck"))


def test_funnel_counts_semantics(spark):
    """Funnel ordering is strict: a click BEFORE the first view doesn't
    count, steps chain off the earliest qualifying event, and the horizon
    cuts late completions."""
    import datetime as dt

    from hugegraph_on_tikv_spark.functions.events import funnel_counts

    t = dt.datetime(2024, 3, 1, 9, 0, 0)

    def ev(uid, minute, typ):
        return (uid, t + dt.timedelta(minutes=minute), typ)

    rows = [
        ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "purchase"),  # full
        ev(2, 5, "click"), ev(2, 10, "view"),                       # click too early
        ev(3, 0, "view"), ev(3, 1, "click"),                        # no purchase
        ev(4, 0, "view"), ev(4, 2, "click"),
        ev(4, 60 * 24 * 8, "purchase"),                             # past horizon
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string")
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(events, ("view", "click", "purchase"),
                                  horizon_days=7).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 1}


def test_cohort_retention_semantics(spark):
    import datetime as dt

    from hugegraph_on_tikv_spark.functions.events import cohort_retention

    mon = dt.datetime(2024, 3, 4, 12, 0, 0)      # a Monday
    rows = [
        (1, mon), (1, mon + dt.timedelta(days=7)),          # week 0 and 1
        (2, mon + dt.timedelta(days=2)),                    # week 0 only
        (3, mon + dt.timedelta(days=8)),                    # cohort week 1
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {(str(r["cohort"]), r["period_offset"]): r["n_users"]
           for r in cohort_retention(events, "week").collect()}
    w0, w1 = "2024-03-04 00:00:00", "2024-03-11 00:00:00"
    assert got == {(w0, 0): 2, (w0, 1): 1, (w1, 0): 1}


def test_stream_windowed_counts_equals_batch(spark, tmp_path):
    """stream_windowed_counts (watermarked tumbling-window value counts —
    the streaming heavy-hitters face) equals the batch windowed count for
    every window.  Both files land in ONE trigger (id-interleaved halves
    fed as separate batches would legitimately drop half-b rows older
    than half-a's watermark — the documented late-data contract), and the
    sink runs complete-mode to memory so the comparison includes the tail
    windows append mode would hold back behind the final watermark."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.catalog import load_events
    from hugegraph_on_tikv_spark.streaming.ingest import stream_windowed_counts
    from hugegraph_on_tikv_spark.streaming.stream_joins import ntz_as_utc_instant

    events = load_events(spark, "/root/testdata/sf0.001") \
        .select("event_id", "ts", "event_type")
    src = str(tmp_path / "src")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    half_a.write.mode("append").parquet(src)
    half_b.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(src)
              .withColumn("wts", ntz_as_utc_instant(F.col("ts"))))
    q = (stream_windowed_counts(stream, "event_type", "wts",
                                window="1 hour", watermark="30 minutes")
         .writeStream.format("memory").queryName("win_counts_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("win_counts_stream") \
        .withColumn("ws", F.col("window_start").cast("long"))
    batch = (events.withColumn("wts", ntz_as_utc_instant(F.col("ts")))
             .groupBy(F.window("wts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("ws", F.col("w.start").cast("long")))
    got_set = {(r["ws"], r["value"], r["n_occurrences"])
               for r in got.collect()}
    want_set = {(r["ws"], r["event_type"], r["n"]) for r in batch.collect()}
    # availableNow flushes every window at end-of-stream: exact equality
    assert got_set == want_set and got_set


def test_stream_windowed_counts_min_count_filter(spark, tmp_path):
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.sources.catalog import load_events
    from hugegraph_on_tikv_spark.streaming.ingest import stream_windowed_counts
    from hugegraph_on_tikv_spark.streaming.stream_joins import ntz_as_utc_instant

    events = load_events(spark, "/root/testdata/sf0.001") \
        .select("event_id", "ts", "event_type")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).parquet(src)
              .withColumn("wts", ntz_as_utc_instant(F.col("ts"))))
    out_dir = str(tmp_path / "out")
    q = (stream_windowed_counts(stream, "event_type", "wts",
                                window="6 hours", watermark="30 minutes",
                                min_count=5)
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    assert got.agg(F.min("n_occurrences")).first()[0] >= 5


def test_stream_enrich_matches_batch(spark, tmp_path):
    """Stream-static enrichment: the streamed join over micro-batches
    equals the batch join, stateless (no watermark needed), and the left
    form keeps unmatched stream rows."""
    from hugegraph_on_tikv_spark.streaming.ingest import stream_enrich

    events_dir = str(tmp_path / "events")
    schema = "event_id long, user_id long, value double"
    spark.createDataFrame(
        [(1, 10, 1.0), (2, 11, 2.0), (3, 99, 3.0)], schema
    ).coalesce(1).write.mode("append").parquet(events_dir)
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "silver")], "user_id long, tier string")

    stream = spark.readStream.schema(schema).parquet(events_dir)
    enriched = stream_enrich(stream, dim, "user_id")
    got: list = []
    q = (enriched.writeStream.foreachBatch(
            lambda df, bid: got.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    want = {(r["event_id"], r["tier"]) for r in
            spark.read.parquet(events_dir).join(dim, "user_id", "left")
            .collect()}
    assert {(r["event_id"], r["tier"]) for r in got} == want
    assert (3, None) in want                 # left keeps unmatched rows

    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner/left"):
        stream_enrich(stream, dim, "user_id", how="full_outer")


def test_resample_gapfill_dense_grid_and_ffill(spark):
    """Gap-filled resampling: every bucket of the [min, max] range appears
    for every group, empties carry n_events=0, and forward-fill carries
    the last observed sum across gaps."""
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.windows import resample_gapfill

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, t0, 10, "click", 2.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 10, "click", 3.0, "{}"),
        # 11:00 empty for click
        (3, t0 + dt.timedelta(hours=2), 10, "click", 7.0, "{}"),
        (4, t0 + dt.timedelta(hours=1), 11, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    out = {(r["bucket_start"], r["event_type"]): r
           for r in resample_gapfill(df, "1 hour",
                                     forward_fill=True).collect()}
    hours = [t0, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=2)]
    # dense: 3 buckets x 2 groups
    assert set(out) == {(h, g) for h in hours for g in ("click", "view")}
    assert out[(hours[0], "click")]["n_events"] == 2
    assert out[(hours[0], "click")]["sum_value"] == 5.0
    gap = out[(hours[1], "click")]
    assert gap["n_events"] == 0 and gap["sum_value"] is None
    assert gap["filled_value"] == 5.0              # carried across the gap
    assert out[(hours[2], "click")]["filled_value"] == 7.0
    assert out[(hours[0], "view")]["n_events"] == 0
    assert out[(hours[0], "view")]["filled_value"] is None  # nothing yet


def test_resample_interpolate_linear(spark):
    import datetime as dt

    from hugegraph_on_tikv_spark.streaming.windows import resample_interpolate

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, t0, 10, "m", 2.0, "{}"),
        # 11:00, 12:00 empty; 13:00 observed -> linear 2,4,6,8
        (2, t0 + dt.timedelta(hours=3), 10, "m", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    out = {r["bucket_start"]: r["interp_value"]
           for r in resample_interpolate(df, "1 hour").collect()}
    hours = [t0 + dt.timedelta(hours=i) for i in range(4)]
    assert [out[h] for h in hours] == [2.0, 4.0, 6.0, 8.0]


def test_event_transitions_semantics(spark):
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.functions.events import event_transitions

    # user 1: a -> b -> a ; user 2: a -> b ; simultaneous ties broken by
    # event_id (user 3 has two events at the same ts)
    rows = [
        (1, 1, "2024-01-01 10:00:00", "a"),
        (2, 1, "2024-01-01 10:01:00", "b"),
        (3, 1, "2024-01-01 10:02:00", "a"),
        (4, 2, "2024-01-01 11:00:00", "a"),
        (5, 2, "2024-01-01 11:01:00", "b"),
        (6, 3, "2024-01-01 12:00:00", "b"),
        (7, 3, "2024-01-01 12:00:00", "a"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in event_transitions(events).collect()}
    # a->b twice (users 1, 2); b->a twice (user 1, user 3 via event_id tie)
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (2, 1.0)
    assert set(got) == {("a", "b"), ("b", "a")}


def test_pair_association_exact(spark):
    import pytest

    from hugegraph_on_tikv_spark.functions.affinity import pair_association

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1  => N=6
    rows = ([(b, i) for b, items in enumerate(
        [(1, 2), (1, 2), (1, 2), (1, 3), (2, 3), (1,)]) for i in items])
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {(r["item_a"], r["item_b"]): r
           for r in pair_association(df, "basket", "item",
                                     min_support=2).collect()}
    assert set(got) == {(1, 2)}  # only pair with support >= 2
    r = got[(1, 2)]
    assert (r["n_a"], r["n_b"], r["n_ab"]) == (5, 4, 3)
    assert r["confidence"] == pytest.approx(3 / 5)
    assert r["lift"] == pytest.approx(round(3 * 6 / (5 * 4), 6))
    # duplicate facts in a basket don't double count
    dup = df.union(df)
    got2 = {(r["item_a"], r["item_b"]): (r["n_a"], r["n_b"], r["n_ab"])
            for r in pair_association(dup, "basket", "item",
                                      min_support=2).collect()}
    assert got2 == {(1, 2): (5, 4, 3)}


def test_stream_stream_full_outer_attribution_join(spark, tmp_path):
    """FULL-OUTER stream-stream interval join: beyond leftOuter's
    unmatched clicks, never-attributed VIEWS emit NULL-click rows on
    click-side watermark expiry.  Same two-trigger sentinel recipe; the
    union of both triggers' output must equal the batch full twin."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.streaming import stream_joins

    ev = load_events(spark, "/root/testdata/sf0.001")
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "view").write.parquet(views_dir)

    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
            for r in batch_df.collect()
        )

    q = stream_joins.stream_attribution_join(
        spark, clicks_dir, views_dir, str(tmp_path / "ckpt"), sink,
        how="fullOuter")
    q.awaitTermination(180)

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel_ts = max_ts + dt.timedelta(hours=2)
    sentinel = spark.createDataFrame(
        [(10**9, sentinel_ts, -1, "click", 0.0, "{}")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    sentinel.write.mode("append").parquet(clicks_dir)
    sentinel.withColumn("event_type", F.lit("view")) \
        .write.mode("append").parquet(views_dir)

    q2 = stream_joins.stream_attribution_join(
        spark, clicks_dir, views_dir, str(tmp_path / "ckpt"), sink,
        how="fullOuter")
    q2.awaitTermination(180)

    real = [t for t in got if t[2] != -1]
    want = [
        (r["click_id"], r["view_id"], r["user_id"], r["lag_us"])
        for r in stream_joins.attribution_join_full(
            spark.read.parquet(clicks_dir).filter("user_id <> -1"),
            spark.read.parquet(views_dir).filter("user_id <> -1"),
        ).collect()
    ]
    assert sorted(real, key=str) == sorted(want, key=str)
    # both NULL classes present: clicks without views AND views without clicks
    assert any(t[1] is None for t in real)
    assert any(t[0] is None for t in real)


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    """The streaming decontamination (foreachBatch, two micro-batch files)
    keeps exactly the docs dedup.decontaminate keeps in strict mode, and
    the union across batches equals the one-shot batch result."""
    from pyspark.sql import functions as F

    from hugegraph_on_tikv_spark.functions.dedup import decontaminate
    from hugegraph_on_tikv_spark.sources.catalog import load_table
    from hugegraph_on_tikv_spark.streaming.ingest import (
        eval_fingerprints, stream_decontaminate)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    evald = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    d = str(tmp_path / "stream")
    corpus.filter("doc_id % 2 = 0").write.parquet(d)
    corpus.filter("doc_id % 2 = 1").write.mode("append").parquet(d)

    fps = eval_fingerprints(evald, n=8).localCheckpoint(eager=True)
    got: list = []

    def sink(batch_df, batch_id):
        got.extend((r["doc_id"]) for r in batch_df.select("doc_id").collect())

    q = stream_decontaminate(spark, d, fps, str(tmp_path / "ckpt"), sink,
                             schema="doc_id long, text string", n=8)
    q.awaitTermination(180)

    want = sorted(r["doc_id"] for r in
                  decontaminate(corpus, evald, n=8).collect())
    assert sorted(got) == want
    assert len(want) < corpus.count()      # something was actually dropped
