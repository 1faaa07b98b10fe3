"""Durable table catalog: named mutable tables backed by parquet.

The reference's "DDL" is an in-memory name registry (tables are key
prefixes; TikvStdSessions.java:103-124) and its stores commit mutation
batches per-table via atomic KV batches (TikvStore.java:246-284).  The Spark
analog: each logical table is a parquet directory; a mutation commit writes
the next version directory and atomically swaps a `current` pointer file —
per-table atomic, best-effort across tables (the reference's exact
contract, supportsTransaction=false).

This is the durable counterpart of the in-memory TableState used by the
query layer; both share MutationBatch semantics.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hugegraph_on_tikv_spark.operators.mutations import MutationBatch, TableState


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- registry (I3) ------------------------------------------------------
    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, name, "meta.json")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._meta_path(d))
        )

    def create_table(self, name: str, df: DataFrame, key: str = "id") -> None:
        if self.exists(name):
            raise ValueError(f"table {name!r} already exists")
        os.makedirs(os.path.join(self.root, name), exist_ok=True)
        self._write_version(name, df, version=1, key=key)

    def drop_table(self, name: str) -> None:
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    # -- versioned storage --------------------------------------------------
    def _write_version(self, name: str, df: DataFrame, version: int, key: str,
                       view: dict | None = None) -> None:
        data_dir = os.path.join(self.root, name, f"v{version}")
        df.write.mode("overwrite").parquet(data_dir)
        meta = {"version": version, "key": key, "data": f"v{version}"}
        if view is None and os.path.exists(self._meta_path(name)):
            view = self._meta(name).get("view")  # carry view state through
        if view is not None:
            meta["view"] = view
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(name))  # the atomic pointer swap
        # Retain the immediately-previous version: a reader that resolved
        # version N's file list (Spark's InMemoryFileIndex binds files at
        # read.parquet time) must stay valid while version N+1 commits —
        # the reader-isolation half of the atomic-pointer contract.  Only
        # versions older than the previous one are reclaimed here; callers
        # that know no readers are live can purge_versions() explicitly.
        for d in os.listdir(os.path.join(self.root, name)):
            if d.startswith("v") and d not in (f"v{version}", f"v{version - 1}"):
                shutil.rmtree(os.path.join(self.root, name, d), ignore_errors=True)

    def purge_versions(self, name: str) -> None:
        """Reclaim every non-current version directory.  Safe only when no
        reader still holds a pre-swap DataFrame (e.g. between jobs)."""
        current = self._meta(name)["data"]
        for d in os.listdir(os.path.join(self.root, name)):
            if d.startswith("v") and d != current:
                shutil.rmtree(os.path.join(self.root, name, d), ignore_errors=True)

    def _meta(self, name: str) -> dict:
        with open(self._meta_path(name)) as f:
            return json.load(f)

    def table(self, name: str) -> TableState:
        meta = self._meta(name)
        df = self.spark.read.parquet(os.path.join(self.root, name, meta["data"]))
        return TableState(df, key=meta["key"])

    def versions(self, name: str) -> list[int]:
        """Version numbers still on disk, oldest first (current + the
        retained previous one under the default retention)."""
        base = os.path.join(self.root, name)
        return sorted(int(d[1:]) for d in os.listdir(base)
                      if d.startswith("v") and d[1:].isdigit())

    def table_at(self, name: str, version: int) -> TableState:
        """Time-travel read: the table AS OF `version`, served straight
        from that version's immutable directory — the natural dividend of
        the versioned-pointer layout (every commit is a full immutable
        snapshot; the pointer swap just changes which one is current).
        Only versions the retention policy still holds are readable
        (current + previous by default; more until purge_versions runs).
        Lets a pipeline pin its inputs: run N reads version V while
        writers advance to V+1, and a re-run of N reproduces exactly."""
        d = os.path.join(self.root, name, f"v{version}")
        if not os.path.isdir(d):
            raise ValueError(
                f"version {version} of {name} is not retained "
                f"(available: {self.versions(name)})")
        return TableState(self.spark.read.parquet(d),
                          key=self._meta(name)["key"])

    def table_changes(self, name: str, v_from: int, v_to: int) -> DataFrame:
        """CDC between two retained versions: one full-outer join on the
        registered key over the two immutable snapshots.

        Output: the key columns, `_change_type` in ('insert', 'delete',
        'update'), and one value column per non-key column of the `v_to`
        schema — the after-image for insert/update, the before-image for
        delete (a column present in only one version is NULL on the other
        side).  Rows whose common columns are null-safe-equal are dropped,
        so an idempotent upsert replay diffs to empty.

        Scale: the join shuffles both snapshots on the key once; there is
        no log replay because versions are full immutable snapshots — the
        pointer-swap layout trades write amplification for exactly this
        one-join diff and reproducible time travel.  (Delta/Iceberg-style
        `table_changes`, re-derived rather than logged.)"""
        from functools import reduce

        from pyspark.sql import functions as F

        a = self.table_at(name, v_from).df
        b = self.table_at(name, v_to).df
        keys = self.table_key(name)
        a2 = a.select([F.col(c).alias(f"_a_{c}") for c in a.columns])
        b2 = b.select([F.col(c).alias(f"_b_{c}") for c in b.columns])
        cond = reduce(
            lambda x, y: x & y,
            [F.col(f"_a_{k}").eqNullSafe(F.col(f"_b_{k}")) for k in keys])
        j = a2.join(b2, cond, "full_outer")

        in_a = reduce(lambda x, y: x | y,
                      [F.col(f"_a_{k}").isNotNull() for k in keys])
        in_b = reduce(lambda x, y: x | y,
                      [F.col(f"_b_{k}").isNotNull() for k in keys])
        common = [c for c in a.columns if c in set(b.columns) and c not in keys]
        differs = reduce(
            lambda x, y: x | y,
            [~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")) for c in common],
            F.lit(False))
        change = (
            F.when(~in_a, F.lit("insert"))
            .when(~in_b, F.lit("delete"))
            .when(differs, F.lit("update"))
        )
        j = j.withColumn("_change_type", change).filter(
            F.col("_change_type").isNotNull())

        out_vals = []
        b_nonkey = [c for c in b.columns if c not in keys]
        a_cols = set(a.columns)
        for c in b_nonkey:
            before = (F.col(f"_a_{c}") if c in a_cols
                      else F.lit(None).cast(b.schema[c].dataType))
            out_vals.append(
                F.when(F.col("_change_type") == "delete", before)
                .otherwise(F.col(f"_b_{c}")).alias(c))
        out_keys = [F.coalesce(F.col(f"_b_{k}"), F.col(f"_a_{k}")).alias(k)
                    for k in keys]
        return j.select(*out_keys, F.col("_change_type"), *out_vals)

    def table_key(self, name: str) -> list[str]:
        """The registered key, always as a list (composite-friendly)."""
        key = self._meta(name)["key"]
        return list(key) if isinstance(key, list) else [key]

    # -- maintained-view support (streaming/view_maintenance.py) ------------
    def view_meta(self, name: str) -> dict:
        """View-maintenance state (e.g. last applied batch id, measure
        spec).  Lives inside meta.json so it swaps atomically WITH the data
        pointer — a crashed refresh can never publish data without its
        batch-id watermark or vice versa."""
        return self._meta(name).get("view", {})

    def set_view_meta(self, name: str, view: dict) -> None:
        meta = self._meta(name)
        meta["view"] = view
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(name))

    def replace_data(self, name: str, df: DataFrame,
                     view_meta: dict | None = None) -> None:
        """Swap in a new full version of the table's data (one atomic
        pointer move), optionally updating view meta in the same swap."""
        meta = self._meta(name)
        self._write_version(name, df, meta["version"] + 1, meta["key"],
                            view=view_meta if view_meta is not None
                            else meta.get("view"))

    # -- mutations (M6/M9 at store level) -----------------------------------
    def commit(self, batch: MutationBatch, now=None) -> None:
        """Apply a buffered batch: per-table atomic pointer swap, fixed table
        order, best-effort across tables (TikvStore.java:270-284).  `now`
        anchors TTL expire_at computation (tests/backfills)."""
        table_names = sorted(batch._tables.keys())
        states = {n: self.table(n) for n in table_names}
        new_states = batch.commit(states, now=now)
        for n in table_names:
            meta = self._meta(n)
            self._write_version(n, new_states[n].df, meta["version"] + 1, meta["key"])

    def upsert(self, name: str, df: DataFrame, keys: str | list[str] | None = None,
               checks: dict[str, str] | None = None) -> None:
        """Public bulk upsert: replace same-key rows with `df`'s rows as ONE
        per-table-atomic commit (version pointer swap).  `keys` defaults to
        the table's registered key (which may itself be composite); a caller
        passing `keys` explicitly must match the registered key — merging on
        any OTHER column set would let a batch smuggle duplicate
        registered-key rows past the anti-join and silently break the
        table's key-uniqueness invariant.  Intra-`df` duplicate keys are
        collapsed (dropDuplicates) so idempotent streaming replays hold.

        `checks` gates the commit on declarative expectations
        (functions/profiling.enforce_expectations): the INCOMING batch is
        audited before any version is written, so a violating batch leaves
        the table untouched at its current version — CHECK constraints at
        the write path."""
        if checks:
            from hugegraph_on_tikv_spark.functions.profiling import (
                enforce_expectations,
            )

            enforce_expectations(df, checks)
        meta = self._meta(name)
        reg = meta["key"] if isinstance(meta["key"], list) else [meta["key"]]
        key_cols = [keys] if isinstance(keys, str) else (list(keys) if keys else reg)
        if sorted(key_cols) != sorted(reg):
            raise ValueError(
                f"upsert keys {key_cols!r} must match table {name!r}'s "
                f"registered key {reg!r} (key uniqueness is a table invariant)")
        state = self.table(name)
        incoming = df.dropDuplicates(key_cols)
        merged = (
            state.df.join(incoming.select(*key_cols), key_cols, "left_anti")
            .unionByName(incoming)
        )
        self._write_version(name, merged, meta["version"] + 1, meta["key"])

    def add_column(self, name: str, col_name: str, col_type: str,
                   default=None) -> None:
        """Schema evolution as an ordinary versioned commit: the next
        version carries the new column (backfilled with `default`, NULL by
        default), the pointer swaps atomically, and readers pinned to the
        pre-evolution version — including `table_at` time-travel reads —
        keep the old schema untouched.  No in-place file mutation: parquet
        versions are immutable, so evolution is just another write."""
        from pyspark.sql import functions as F

        meta = self._meta(name)
        state = self.table(name)
        if col_name in state.df.columns:
            raise ValueError(f"column {col_name!r} already exists on {name!r}")
        evolved = state.df.withColumn(col_name, F.lit(default).cast(col_type))
        self._write_version(name, evolved, meta["version"] + 1, meta["key"])

    def drop_column(self, name: str, col_name: str) -> None:
        """Inverse evolution: the next version omits the column.  Refuses
        to drop a registered key column (key uniqueness is the table's
        invariant, not a schema detail)."""
        meta = self._meta(name)
        reg = meta["key"] if isinstance(meta["key"], list) else [meta["key"]]
        if col_name in reg:
            raise ValueError(f"cannot drop key column {col_name!r} of {name!r}")
        state = self.table(name)
        if col_name not in state.df.columns:
            raise ValueError(f"no column {col_name!r} on {name!r}")
        self._write_version(name, state.df.drop(col_name),
                            meta["version"] + 1, meta["key"])

    def truncate(self, name: str) -> None:
        """M7: clear one table."""
        meta = self._meta(name)
        state = self.table(name)
        self._write_version(name, state.truncate().df, meta["version"] + 1, meta["key"])

    def truncate_all(self) -> None:
        """M8: store-level truncate — loop of M7 (TikvStore.java:246-259)."""
        for name in self.list_tables():
            self.truncate(name)

    def vacuum(self, name: str, now=None) -> int:
        """TTL vacuum (M1 read contract, durable form): write a new version
        without expired rows — the compaction the reference delegates to
        TiKV's native TTL.  Returns rows removed."""
        meta = self._meta(name)
        state = self.table(name)
        before = state.df.count()
        live = state.vacuum(now)
        after = live.df.count()
        if after != before:
            self._write_version(name, live.df, meta["version"] + 1, meta["key"])
        return before - after
