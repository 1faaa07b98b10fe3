"""Durable table catalog: DDL registry + versioned atomic commits."""

from __future__ import annotations

import tempfile

import pytest

from hugegraph_on_tikv_spark.operators.mutations import MutationBatch
from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "store"))


def test_create_list_drop(spark, catalog):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.create_table("t1", df)
    catalog.create_table("t2", df)
    assert catalog.list_tables() == ["t1", "t2"]
    with pytest.raises(ValueError):
        catalog.create_table("t1", df)
    catalog.drop_table("t1")
    assert catalog.list_tables() == ["t2"]


def test_commit_survives_reopen(spark, catalog):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.create_table("t", df)
    batch = MutationBatch()
    batch.insert("t", {"id": 3, "v": "c"})
    batch.delete("t", 1)
    catalog.commit(batch)

    reopened = TableCatalog(spark, catalog.root)
    rows = {r["id"]: r["v"] for r in reopened.table("t").df.collect()}
    assert rows == {2: "b", 3: "c"}


def test_multi_table_commit_and_truncate_all(spark, catalog):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    catalog.create_table("a", df)
    catalog.create_table("b", df)
    batch = MutationBatch()
    batch.insert("a", {"id": 2, "v": "y"})
    batch.insert("b", {"id": 9, "v": "z"})
    catalog.commit(batch)
    assert catalog.table("a").df.count() == 2
    assert catalog.table("b").df.count() == 2
    catalog.truncate_all()
    assert catalog.table("a").df.count() == 0
    assert catalog.table("b").df.count() == 0
    # schema retained after truncate (M7 clears rows, not the table)
    assert catalog.table("a").df.columns == ["id", "v"]


def test_catalog_ttl_vacuum(spark, catalog):
    import datetime as dt

    df = spark.createDataFrame([(1, "keep")], "id long, v string")
    catalog.create_table("t", df)
    batch = MutationBatch()
    t0 = dt.datetime(2024, 1, 1)
    batch.insert("t", {"id": 2, "v": "shortlived"}, ttl=60)
    catalog.commit(batch, now=t0)

    assert catalog.table("t").df.count() == 2
    removed = catalog.vacuum("t", now=t0 + dt.timedelta(hours=1))
    assert removed == 1
    rows = {r["id"] for r in catalog.table("t").df.collect()}
    assert rows == {1}


def test_public_upsert(spark, catalog):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.create_table("u", df)
    up = spark.createDataFrame([(2, "B"), (2, "B2"), (3, "c")], "id long, v string")
    catalog.upsert("u", up)
    got = {r["id"]: r["v"] for r in catalog.table("u").df.collect()}
    assert got[1] == "a" and got[3] == "c"
    assert got[2] in ("B", "B2")  # intra-batch dup collapsed to ONE row
    assert catalog.table("u").df.count() == 3


def test_vacuum_isolated_from_concurrent_reader(spark, catalog):
    """The reader-isolation half of the atomic-pointer contract (SURVEY §7):
    a reader that resolved version N's files BEFORE a vacuum commits N+1
    keeps reading N's data unaffected — the previous version directory is
    retained through the swap, so the reader's bound file list stays valid."""
    import datetime as dt
    import os

    df = spark.createDataFrame([(1, "keep")], "id long, v string")
    catalog.create_table("t", df)
    t0 = dt.datetime(2024, 1, 1)
    batch = MutationBatch()
    batch.insert("t", {"id": 2, "v": "shortlived"}, ttl=60)
    catalog.commit(batch, now=t0)

    # reader binds version N (its parquet file list resolves here)
    pre_vacuum = catalog.table("t").df
    assert pre_vacuum.count() == 2

    removed = catalog.vacuum("t", now=t0 + dt.timedelta(hours=1))
    assert removed == 1

    # post-swap readers see the vacuumed table...
    assert {r["id"] for r in catalog.table("t").df.collect()} == {1}
    # ...while the pre-swap reader still sees its version, fully intact
    assert {r["id"] for r in pre_vacuum.collect()} == {1, 2}
    assert pre_vacuum.count() == 2

    # explicit purge reclaims the old version once no readers are live
    catalog.purge_versions("t")
    dirs = [d for d in os.listdir(os.path.join(catalog.root, "t"))
            if d.startswith("v")]
    assert dirs == [catalog._meta("t")["data"]]


def test_write_version_retains_only_previous(spark, catalog):
    """Version retention is bounded: each commit keeps current + previous,
    reclaiming anything older — disk cost is 2x steady-state, not unbounded
    history."""
    import os

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    catalog.create_table("t", df)
    for i in range(3):
        batch = MutationBatch()
        batch.insert("t", {"id": 10 + i, "v": "x"})
        catalog.commit(batch)
    dirs = sorted(d for d in os.listdir(os.path.join(catalog.root, "t"))
                  if d.startswith("v"))
    assert dirs == ["v3", "v4"]


def test_time_travel_read(spark, catalog):
    """table_at pins an immutable snapshot: reads of version N reproduce
    exactly while writers advance, unretained versions refuse clearly."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.create_table("tt", df)          # v1
    catalog.upsert("tt", spark.createDataFrame([(2, "B"), (3, "c")],
                                               "id long, v string"))  # v2
    assert catalog.versions("tt") == [1, 2]

    v1 = {r["id"]: r["v"] for r in catalog.table_at("tt", 1).df.collect()}
    v2 = {r["id"]: r["v"] for r in catalog.table_at("tt", 2).df.collect()}
    assert v1 == {1: "a", 2: "b"}
    assert v2 == {1: "a", 2: "B", 3: "c"}
    # current == latest version
    assert {r["id"]: r["v"] for r in catalog.table("tt").df.collect()} == v2

    # a third commit retires v1 under the keep-previous retention
    catalog.upsert("tt", spark.createDataFrame([(4, "d")], "id long, v string"))
    assert catalog.versions("tt") == [2, 3]
    with pytest.raises(ValueError, match="not retained"):
        catalog.table_at("tt", 1)
    # the pinned v2 snapshot still reproduces after the v3 commit
    assert {r["id"]: r["v"]
            for r in catalog.table_at("tt", 2).df.collect()} == v2


def test_schema_evolution_versioned(spark, catalog):
    """add_column/drop_column are ordinary versioned commits: new readers
    see the evolved schema, pinned time-travel readers keep the old one,
    key columns refuse to drop."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.create_table("ev", df)                            # v1
    catalog.add_column("ev", "score", "double", default=0.5)  # v2
    cur = catalog.table("ev").df
    assert set(cur.columns) == {"id", "v", "score"}
    assert {r["score"] for r in cur.collect()} == {0.5}
    # pinned pre-evolution snapshot keeps the old schema
    assert set(catalog.table_at("ev", 1).df.columns) == {"id", "v"}

    with pytest.raises(ValueError, match="already exists"):
        catalog.add_column("ev", "score", "double")
    with pytest.raises(ValueError, match="key column"):
        catalog.drop_column("ev", "id")

    # upserts after evolution carry the new column through the merge
    catalog.upsert("ev", spark.createDataFrame(
        [(2, "B", 0.9), (3, "c", 0.1)], "id long, v string, score double"))
    rows = {r["id"]: (r["v"], r["score"]) for r in catalog.table("ev").df.collect()}
    assert rows == {1: ("a", 0.5), 2: ("B", 0.9), 3: ("c", 0.1)}

    catalog.drop_column("ev", "score")
    assert set(catalog.table("ev").df.columns) == {"id", "v"}


def test_upsert_checks_gate_commit(spark, tmp_path):
    """A batch violating its expectations must leave the table at its
    current version, untouched."""
    import pytest as _pytest

    from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("t", spark.createDataFrame(
        [(1, 10.0)], "id long, amount double"), key="id")
    bad = spark.createDataFrame([(2, -5.0)], "id long, amount double")
    with _pytest.raises(ValueError, match="amount_positive"):
        cat.upsert("t", bad, checks={"amount_positive": "amount > 0"})
    assert cat.table("t").df.count() == 1          # untouched
    assert cat._meta("t")["version"] == 1
    good = spark.createDataFrame([(2, 5.0)], "id long, amount double")
    cat.upsert("t", good, checks={"amount_positive": "amount > 0"})
    assert cat.table("t").df.count() == 2
