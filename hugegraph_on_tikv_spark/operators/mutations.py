"""Mutations: the write path (M1-M9 in SURVEY.md §2.8).

The reference buffers puts / TTL-puts (grouped by TTL value) / deletes /
delete-prefixes / delete-ranges in session maps (TikvStdSessions.java:189-201,
380-426) and flushes them on commit in fixed order via atomic-per-batch TiKV
calls (TikvStdSessions.java:239-279); rollback drops the buffers
(TikvStdSessions.java:285-291).  There is no cross-table atomicity
(supportsTransaction=false, TikvFeatures.java:108-111) and beginTx is a no-op
(TikvStore.java:265-268).

Spark-first: a mutation batch compiles to ONE new DataFrame per table —
upserts become anti-join + union, deletes become anti-joins, property
append/eliminate become column rewrites.  Commit is per-table atomic by
construction (a DataFrame swap, or an atomic parquet overwrite when
persisted), with the same best-effort multi-table contract.  Note: the
reference's `reset()` forgets to clear its TTL buffer
(TikvStdSessions.java:220-225) — a bug we deliberately do NOT replicate.

TTL (M1): `entry.ttl()>0` becomes an `expire_at` timestamp column; reads
filter `expire_at IS NULL OR expire_at > now` and a vacuum pass physically
drops expired rows — the Spark analog of TiKV's server-side expiry.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPIRE_COL = "expire_at"


@dataclass
class _Buffers:
    inserts: list[dict[str, Any]] = field(default_factory=list)       # upsert whole row
    ttl_inserts: dict[float, list[dict[str, Any]]] = field(default_factory=dict)  # ttl_seconds → rows
    deletes: list[Any] = field(default_factory=list)                  # ids
    appends: list[tuple[Any, str, Any]] = field(default_factory=list)     # (id, prop, value)
    eliminates: list[tuple[Any, str]] = field(default_factory=list)       # (id, prop)
    delete_prefixes: list[str] = field(default_factory=list)
    delete_ranges: list[tuple[Any, Any]] = field(default_factory=list)    # [start, end)
    upsert_dfs: list[DataFrame] = field(default_factory=list)             # bulk DataFrame-valued upserts


class MutationBatch:
    """Buffered mutations over many logical tables; `commit` applies each
    table's buffer as one atomic DataFrame transformation (M6 dispatcher,
    TikvStore.java:176-210)."""

    def __init__(self) -> None:
        self._tables: dict[str, _Buffers] = {}

    def _buf(self, table: str) -> _Buffers:
        return self._tables.setdefault(table, _Buffers())

    # M1 — insert/upsert the whole row; ttl in seconds groups the write like
    # the reference's per-TTL batches (TikvStdSessions.java:251-262).
    def insert(self, table: str, row: dict[str, Any], ttl: float | None = None) -> None:
        if ttl:
            self._buf(table).ttl_inserts.setdefault(ttl, []).append(row)
        else:
            self._buf(table).inserts.append(row)

    # M1 bulk — upsert a whole DataFrame of rows in one plan.  The reference
    # SPI streams row commands (TikvStdSessions.java:380-426 buffers them per
    # batch); the Spark-native analog of a *large* batch is a DataFrame, so
    # the merge is ONE anti-join + union regardless of batch size instead of
    # O(batch) literal predicates.
    def upsert_df(self, table: str, rows: DataFrame) -> None:
        self._buf(table).upsert_dfs.append(rows)

    # M2 — delete whole entry by id
    def delete(self, table: str, id_: Any) -> None:
        self._buf(table).deletes.append(id_)

    # M3 — append exactly one property (single-cell contract, TikvTable.java:122-126)
    def append(self, table: str, id_: Any, prop: str, value: Any) -> None:
        self._buf(table).appends.append((id_, prop, value))

    # M4 — eliminate exactly one property (TikvTable.java:128-132)
    def eliminate(self, table: str, id_: Any, prop: str) -> None:
        self._buf(table).eliminates.append((id_, prop))

    # M5/M7-adjacent — bulk deletes by key prefix / key range
    def delete_prefix(self, table: str, prefix: str) -> None:
        self._buf(table).delete_prefixes.append(prefix)

    def delete_range(self, table: str, start: Any, end: Any) -> None:
        self._buf(table).delete_ranges.append((start, end))

    def rollback(self) -> None:
        """Drop all buffers (TikvStdSessions.java:285-291) — including TTL
        buffers (fixing the reference's reset() bug)."""
        self._tables.clear()

    # -- commit ------------------------------------------------------------
    def commit(self, tables: dict[str, "TableState"],
               now: _dt.datetime | None = None) -> dict[str, "TableState"]:
        """Apply buffered mutations: returns new TableStates.  Per-table
        atomic (one plan swap per table), best-effort across tables — the
        reference's exact contract (TikvStore.java:270-284)."""
        now = now or _dt.datetime.now(_dt.timezone.utc)
        out = dict(tables)
        for name, buf in self._tables.items():
            state = tables[name]
            out[name] = state.apply(buf, now)
        self._tables.clear()
        return out


@dataclass
class TableState:
    """A mutable logical table = current DataFrame + key column.  Persisting
    `df` with an atomic parquet overwrite gives the durable variant; tests
    exercise the in-memory swap."""

    df: DataFrame
    key: str = "id"

    def apply(self, buf: _Buffers, now: _dt.datetime) -> "TableState":
        df, kc = self.df, self.key
        spark = df.sparkSession

        # deletes first so an insert of a deleted id in the same batch wins
        del_ids = list(buf.deletes)
        elim_by_id: dict[Any, list[str]] = {}
        for id_, prop in buf.eliminates:
            elim_by_id.setdefault(id_, []).append(prop)
        app_by_id: dict[Any, dict[str, Any]] = {}
        for id_, prop, value in buf.appends:
            app_by_id.setdefault(id_, {})[prop] = value

        if del_ids:
            df = df.filter(~F.col(kc).isin(del_ids))
        for prefix in buf.delete_prefixes:
            df = df.filter(~F.col(kc).cast("string").startswith(prefix))
        for start, end in buf.delete_ranges:
            df = df.filter(~((F.col(kc) >= start) & (F.col(kc) < end)))

        # single-property append/eliminate = column rewrite on matching ids.
        # Driver-side literals (mutation batches are small command streams in
        # the SPI); bulk updates go through insert-upsert instead.
        for id_, props in app_by_id.items():
            for prop, value in props.items():
                df = df.withColumn(
                    prop, F.when(F.col(kc) == F.lit(id_), F.lit(value)).otherwise(F.col(prop))
                )
        for id_, props_list in elim_by_id.items():
            for prop in props_list:
                df = df.withColumn(
                    prop,
                    F.when(F.col(kc) == F.lit(id_), F.lit(None).cast(df.schema[prop].dataType))
                    .otherwise(F.col(prop)),
                )

        # upserts: new rows replace same-key rows (anti-join + union)
        new_rows = list(buf.inserts)
        ttl_rows: list[dict[str, Any]] = []
        for ttl, rows in sorted(buf.ttl_inserts.items()):
            expire = now + _dt.timedelta(seconds=ttl)
            for r in rows:
                r = dict(r)
                r[EXPIRE_COL] = expire
                ttl_rows.append(r)
        all_new = new_rows + ttl_rows
        if all_new:
            if EXPIRE_COL not in df.columns and ttl_rows:
                df = df.withColumn(EXPIRE_COL, F.lit(None).cast("timestamp"))
            fields = df.schema.fieldNames()
            normalized = [{k: r.get(k) for k in fields} for r in all_new]
            new_df = spark.createDataFrame(normalized, schema=df.schema)
            new_ids = [r[self.key] for r in all_new]
            df = df.filter(~F.col(kc).isin(new_ids)).unionByName(new_df)

        # bulk DataFrame-valued upserts: one anti-join + union per batch df,
        # later batches win over earlier ones and over everything above.
        # Duplicate keys WITHIN one batch are rejected (there is no row order
        # inside a DataFrame, so "last wins" would be nondeterministic) —
        # same eager contract as the missing-columns check.
        for updf in buf.upsert_dfs:
            missing = set(df.columns) - set(updf.columns)
            if missing:
                raise ValueError(f"bulk upsert missing columns: {sorted(missing)}")
            dup = (updf.groupBy(kc).count().filter(F.col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    f"bulk upsert batch has duplicate key {dup[0][0]!r}; "
                    "dedup the batch first (dropDuplicates) — intra-batch "
                    "last-wins is not well-defined"
                )
            df = df.join(updf.select(kc).distinct(), kc, "left_anti") \
                   .unionByName(updf.select(*df.columns))

        return TableState(df, self.key)

    # -- TTL reads + vacuum (M1 read contract) -----------------------------
    def read(self, now: _dt.datetime | None = None) -> DataFrame:
        """Live rows only: expired rows are invisible to readers even before
        vacuum — mirroring TiKV's TTL semantics."""
        if EXPIRE_COL not in self.df.columns:
            return self.df
        now = now or _dt.datetime.now(_dt.timezone.utc)
        # literal must match the column's timestamp flavor: a bare
        # F.lit(datetime) is an instant interpreted in the session timezone,
        # which silently shifts comparisons against TIMESTAMP_NTZ columns.
        from pyspark.sql.types import TimestampNTZType

        if isinstance(self.df.schema[EXPIRE_COL].dataType, TimestampNTZType):
            s = now.replace(tzinfo=None).strftime("%Y-%m-%d %H:%M:%S.%f")
            now_lit = F.expr(f"TIMESTAMP_NTZ '{s}'")
        else:
            now_lit = F.lit(now)
        return self.df.filter(F.col(EXPIRE_COL).isNull() | (F.col(EXPIRE_COL) > now_lit))

    def vacuum(self, now: _dt.datetime | None = None) -> "TableState":
        """Physically drop expired rows (the compaction the reference gets
        from TiKV's native TTL)."""
        return TableState(self.read(now), self.key)

    def truncate(self) -> "TableState":
        """M7/M8: table clear (TikvTable.java:87-90, TikvStore.java:246-259)."""
        return TableState(self.df.limit(0), self.key)


def scd2_from_changes(changes: DataFrame, keys: list[str],
                      batch_col: str = "batch_id",
                      op_col: str = "_change_type") -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log — the
    natural consumer of TableCatalog.table_changes streams: each
    insert/update row becomes a versioned segment
    (valid_from = its batch, valid_to = the key's NEXT change of any kind,
    is_current = no later change); a delete closes the previous segment
    without opening one.

    One window shuffle on the key — the lead() must be computed BEFORE
    deletes are dropped, or a deleted key's last segment would stay open
    forever.  Scale: exactly the partitioning any per-key history already
    needs; no self-join, no state.

    Change logs are expected to carry at most one row per (key, batch) —
    TableCatalog.table_changes guarantees it.  If a producer ever emits
    two ops for one key in one batch, the window orders them
    deterministically by (batch, op) so reruns agree; 'delete' sorts
    first, closing any same-batch segment at zero length."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(batch_col).asc(),
                                          F.col(op_col).asc())
    return (
        changes
        .withColumn("valid_to", F.lead(F.col(batch_col)).over(w))
        .filter(F.col(op_col) != "delete")
        .withColumn("valid_from", F.col(batch_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(batch_col, op_col)
    )
