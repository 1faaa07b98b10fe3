"""Incremental maintenance of the bucketed vertex layout — the vertex-side
mirror of test_edge_layout_ivm.py (VERDICT r7 item 8).

The reference maintains its vertex table per-mutation
(TikvTables.java:114-127 via TikvStore.mutate); Spark-side the contract is
per-batch: `VertexLayout.upsert` must make a vertex-PROPERTY delta visible
in the bucketed copy while rewriting ONLY the buckets the mutated ids hash
into — untouched bucket files are hard-linked into the next version,
inode-identical (no full-view rebuild), with the same exactly-once batch
ids and crash consistency as the edge layout.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.edge_layout import (VertexLayout,
                                                         _data_files)

V_SCHEMA = "id long, name string, balance double"


def _verts(spark, rows):
    return spark.createDataFrame(rows, V_SCHEMA)


def _base_rows(n=300):
    return [(i, f"v{i}", float(i)) for i in range(n)]


def _mk_layout(spark, tmp_path, name, buckets=8):
    return VertexLayout.materialize(
        _verts(spark, _base_rows()), name, str(tmp_path / "vl"), buckets)


def _rows(df):
    return sorted((r.id, r.name, r.balance) for r in df.collect())


def test_vertex_property_delta_rewrites_only_its_buckets(spark, tmp_path):
    layout = _mk_layout(spark, tmp_path, "t_vivm_a")
    try:
        v1 = layout._copy_dir("id", 1)
        files_before = _data_files(v1)
        inodes_before = {b: os.stat(os.path.join(v1, f)).st_ino
                         for b, f in files_before.items()}

        # a property delta on two vertices + one new + one delete
        ups = _verts(spark, [(3, "v3", 999.0), (17, "renamed", 17.0),
                             (1000, "new", 1.0)])
        dels = _verts(spark, [(5, "v5", 5.0)]).select("id")
        stats = layout.upsert(upserts=ups, delete_keys=dels, batch_id=1)
        assert 0 < stats["id"] < layout.buckets

        # incremental result == full rebuild from the mutated source
        want = sorted(
            [(i, f"v{i}", float(i)) for i in range(300)
             if i not in (3, 17, 5)]
            + [(3, "v3", 999.0), (17, "renamed", 17.0), (1000, "new", 1.0)])
        assert _rows(layout.vertices()) == want

        # untouched buckets: new version hard-links the SAME inode
        v2 = layout._copy_dir("id", 2)
        files_after = _data_files(v2)
        touched = {r[0] for r in
                   ups.select(F.pmod(F.hash("id"), F.lit(layout.buckets)))
                   .union(dels.select(F.pmod(F.hash("id"),
                                             F.lit(layout.buckets))))
                   .distinct().collect()}
        untouched = set(files_before) - touched
        assert untouched, "fixture too small: every bucket touched"
        for b in untouched:
            assert os.stat(os.path.join(v2, files_after[b])).st_ino \
                == inodes_before[b], f"untouched bucket {b} was rewritten"
        for b in touched & set(files_after):
            assert os.stat(os.path.join(v2, files_after[b])).st_ino \
                != inodes_before.get(b)
    finally:
        layout.drop()


def test_vertex_upsert_exactly_once_and_reader_isolation(spark, tmp_path):
    layout = _mk_layout(spark, tmp_path, "t_vivm_b")
    try:
        old_reader = layout.vertices()           # planned against v1
        n_before = old_reader.count()

        ups = _verts(spark, [(2000, "late", 2.0)])
        assert layout.upsert(upserts=ups, batch_id=5) == {"id": 1}
        # replay and stale batch ids are no-ops; version advanced once
        assert layout.upsert(upserts=ups, batch_id=5) == {"id": 0}
        assert layout.upsert(upserts=ups, batch_id=4) == {"id": 0}
        assert layout._meta()["version"] == 2

        # pre-upsert reader still serves v1; fresh reader sees the delta
        assert old_reader.count() == n_before
        assert layout.vertices().count() == n_before + 1

        # foreachBatch adapter: redelivered epoch applies exactly once
        apply = layout.foreach_batch_upserter()
        apply(_verts(spark, [(2001, "epoch", 1.0)]), 6)
        apply(_verts(spark, [(2001, "epoch", 1.0)]), 6)
        assert layout.vertices().filter(F.col("id") == 2001).count() == 1
    finally:
        layout.drop()


def test_vertex_upsert_crash_before_meta_swap_heals_on_retry(spark, tmp_path):
    """Crash with the copy staged but the layout.json pointer swap not yet
    written: fresh readers still see version 1; retrying the SAME batch
    rebuilds v2 and commits exactly-once."""
    layout = _mk_layout(spark, tmp_path, "t_vivm_crash")
    try:
        ups = _verts(spark, [(7, "v7", 777.0)])
        real_write = layout._write_meta

        def crashing_write(meta):
            raise RuntimeError("simulated crash before meta swap")

        layout._write_meta = crashing_write
        with pytest.raises(RuntimeError, match="simulated crash"):
            layout.upsert(upserts=ups, batch_id=1)
        layout._write_meta = real_write

        meta = layout._meta()
        assert meta["version"] == 1 and meta["last_batch_id"] is None
        # a fresh layout handle (what a restart constructs) reads v1 dirs —
        # the commit pointer never moved and v1 files are intact
        assert os.path.exists(layout._copy_dir("id", 1))
        assert _data_files(layout._copy_dir("id", 1))

        stats = layout.upsert(upserts=ups, batch_id=1)
        assert stats == {"id": 1}
        assert layout._meta()["version"] == 2
        got = _rows(layout.vertices())
        assert (7, "v7", 777.0) in got
        assert (7, "v7", 7.0) not in got
        # replay after success: no-op
        assert layout.upsert(upserts=ups, batch_id=1) == {"id": 0}
    finally:
        layout.drop()


def test_stream_appended_vertices_visible_without_rebuild(spark, tmp_path):
    """VERDICT r9 #10, end-to-end: a REAL Structured Streaming query
    (readStream over a vertex-delta directory → foreachBatch upserter)
    appends BRAND-NEW vertex ids into the bucketed layout; they become
    visible through VertexLayout.vertices() while untouched bucket files
    are hard-linked (inode-identical) — stream maintenance, not rebuild."""
    layout = _mk_layout(spark, tmp_path, "t_vivm_stream")
    try:
        v1 = layout._copy_dir("id", 1)
        inodes_before = {b: os.stat(os.path.join(v1, f)).st_ino
                         for b, f in _data_files(v1).items()}
        delta_dir = str(tmp_path / "vdeltas")
        new_rows = [(5000 + i, f"streamed{i}", float(i)) for i in range(6)]
        _verts(spark, new_rows).write.parquet(delta_dir)
        q = (spark.readStream.schema(V_SCHEMA).parquet(delta_dir)
             .writeStream.foreachBatch(layout.foreach_batch_upserter())
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = _rows(layout.vertices())
        for row in new_rows:
            assert row in got
        assert len(got) == 300 + len(new_rows)

        v2 = layout._copy_dir("id", layout._meta()["version"])
        files_after = _data_files(v2)
        touched = {r[0] for r in _verts(spark, new_rows)
                   .select(F.pmod(F.hash("id"), F.lit(layout.buckets)))
                   .distinct().collect()}
        untouched = set(inodes_before) - touched
        assert untouched, "fixture too small: every bucket touched"
        for b in untouched:
            assert os.stat(os.path.join(v2, files_after[b])).st_ino \
                == inodes_before[b], f"untouched bucket {b} was rewritten"
    finally:
        layout.drop()
