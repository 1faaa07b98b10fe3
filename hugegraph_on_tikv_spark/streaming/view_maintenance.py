"""Incremental view maintenance: derived views kept in step with streaming
base-table changes WITHOUT full recompute.

The reference has no derived views — every query re-derives from the KV
tables.  This engine keeps deterministic projections (graph views, the
derived `partsupp`) and would re-project on every query; for a 100 TB base
table that recompute is the dominant cost, so views become maintained state:

* **aggregate views** (`agg_view_*`): group-by views over distributive
  measures (count / scaled-integer sum).  The stored form is the PARTIAL
  state — counts and int64 scaled sums — which is mergeable, so a
  micro-batch refresh is `view FULL OUTER JOIN partial(batch) ON keys`,
  coalesce-summing each measure: one scan of the batch, one of the
  (already aggregated, hence small) view, no base-table scan.  The join
  form (not union + re-groupBy) matters at scale: with the view persisted
  bucketed on its keys, the join's view side is pre-distributed and ONLY
  the micro-batch partial shuffles — a union's downstream groupBy would
  re-exchange the whole view every refresh.
* **projection views** (`projection_view_stream`): distinct-key projections
  with derived columns (the `partsupp` shape: distinct (l_partkey,
  l_suppkey) + arithmetic).  A batch's contribution is its projected
  distinct rows; `TableCatalog.upsert`'s anti-join + union applies them —
  again no base recompute.

Exactly-once: each applied delta records its `batch_id` in the view's meta
inside the SAME atomic version-pointer swap as the data, so a replayed
micro-batch (foreachBatch is at-least-once) is detected and skipped — the
refresh is idempotent under redelivery.

Determinism: sums are maintained as int64 scaled integers (value × 10^4),
exactly mergeable in any order; the presented `sum_value` is one final
division.  A float running sum would drift with merge order and break the
view == full-recompute equivalence the tests (and the driver oracle) check.

100 TB posture: the stored view is aggregated state — orders of magnitude
smaller than the base table — and the merge keys on the view's group keys,
so persisting the view BUCKETED on those keys (sources/bucketing.py) makes
the per-batch merge shuffle only the micro-batch partial
(tests/test_plans.py pins that plan).  The catalog's parquet-swap storage
rewrites the view per refresh; at extreme view sizes you'd partition the
view by a key prefix and rewrite only touched partitions — same merge
algebra, narrower write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog

SUM_SCALE = 10_000  # 4 decimal places — matches the windows' round(sum, 4)


# -- aggregate views --------------------------------------------------------

def agg_partial(df: DataFrame, keys: list[str], sum_cols: list[str],
                hll_cols: list[str] | None = None) -> DataFrame:
    """Partial (mergeable) aggregate state of one batch: per-key row count,
    int64 scaled sums, and (optionally) HLL distinct-count sketches —
    approximate-distinct is the one aggregate whose EXACT form is not
    incrementally maintainable (it would need the full value set), while
    the sketch is closed under union.  Map-side combine applies natively."""
    measures = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.round(F.col(c) * SUM_SCALE).cast("long")).alias(f"_sum_{c}")
        for c in sum_cols
    ] + [
        F.hll_sketch_agg(F.col(c).cast("string")).alias(f"_hll_{c}")
        for c in (hll_cols or [])
    ]
    return df.groupBy(*keys).agg(*measures)


def agg_merge(view_partial: DataFrame, delta_partial: DataFrame,
              keys: list[str]) -> DataFrame:
    """Merge stored partial state with a batch's partial state: a full-outer
    join on the group keys, coalesce-summing each measure.  Partial counts
    and scaled sums are closed under addition, so this is exact — and the
    JOIN shape means a view bucketed on `keys` merges with only the delta
    shuffling (tests/test_plans.py pins that single-exchange plan)."""
    measures = [c for c in view_partial.columns if c not in keys]
    v = view_partial.select(
        *keys, *[F.col(c).alias(f"_v_{c}") for c in measures])
    d = delta_partial.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in measures])

    from hugegraph_on_tikv_spark.functions.sketches import hll_merge_cols

    def merged(c: str):
        a, b = F.col(f"_v_{c}"), F.col(f"_d_{c}")
        if c.startswith("_hll_"):
            # sketches merge by union (either side may be absent for a key)
            return hll_merge_cols(a, b).alias(c)
        return (F.coalesce(a, F.lit(0).cast("long"))
                + F.coalesce(b, F.lit(0).cast("long"))).alias(c)

    return v.join(d, keys, "full_outer").select(
        *keys, *[merged(c) for c in measures])


def agg_finalize(view_partial: DataFrame, sum_cols: list[str],
                 hll_cols: list[str] | None = None) -> DataFrame:
    """Presentable form of the stored partial state: `n_rows`, each scaled
    sum divided back to a double (single division — deterministic), and
    each sketch collapsed to its estimate (`distinct_<col>`)."""
    out = [F.col("_n").alias("n_rows")] + [
        (F.col(f"_sum_{c}") / F.lit(float(SUM_SCALE))).alias(f"sum_{c}")
        for c in sum_cols
    ] + [
        F.hll_sketch_estimate(F.col(f"_hll_{c}")).alias(f"distinct_{c}")
        for c in (hll_cols or [])
    ]
    keys = [c for c in view_partial.columns
            if c != "_n" and not c.startswith(("_sum_", "_hll_"))]
    return view_partial.select(*keys, *out)


def agg_view_create(catalog: TableCatalog, name: str, keys: list[str],
                    sum_cols: list[str], initial: DataFrame,
                    hll_cols: list[str] | None = None) -> None:
    """Register an aggregate view in the catalog.  `initial` is a base-table
    DataFrame (may be empty-filtered) aggregated once to seed the state."""
    catalog.create_table(
        name, agg_partial(initial, keys, sum_cols, hll_cols), key=keys)
    catalog.set_view_meta(name, {"last_batch_id": -1, "sum_cols": sum_cols,
                                 "hll_cols": hll_cols or []})


def agg_view_apply_delta(catalog: TableCatalog, name: str, batch_df: DataFrame,
                         batch_id: int) -> bool:
    """One micro-batch refresh: partial-agg the batch, merge with stored
    state, swap the version pointer.  Returns False (no-op) if `batch_id`
    was already applied — the exactly-once guard under at-least-once
    redelivery; the id is recorded in the same atomic swap as the data."""
    meta = catalog.view_meta(name)
    if batch_id <= meta["last_batch_id"]:
        return False
    keys = catalog.table_key(name)
    delta = agg_partial(batch_df, keys, meta["sum_cols"],
                        meta.get("hll_cols"))
    merged = agg_merge(catalog.table(name).df, delta, keys)
    catalog.replace_data(name, merged,
                         view_meta={**meta, "last_batch_id": batch_id})
    return True


def agg_view_read(catalog: TableCatalog, name: str) -> DataFrame:
    """The finalized view (keys, n_rows, sum_<col>...)."""
    meta = catalog.view_meta(name)
    return agg_finalize(catalog.table(name).df, meta["sum_cols"],
                        meta.get("hll_cols"))


def agg_view_stream(stream_df: DataFrame, catalog: TableCatalog, name: str,
                    checkpoint_dir: str, available_now: bool = True):
    """writeStream → per-micro-batch incremental refresh of an aggregate
    view created with `agg_view_create`.  Each micro-batch costs one scan of
    the batch plus one merge with the (small, aggregated) stored state —
    the view tracks the stream without ever re-reading the base table."""
    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg_view_apply_delta(catalog, name, batch_df, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -- projection views (the derived-partsupp / graph-edge shape) -------------

def projection_view_stream(stream_df: DataFrame, catalog: TableCatalog,
                           name: str, keys: list[str], derived: dict[str, str],
                           checkpoint_dir: str, available_now: bool = True):
    """Maintain a distinct-key projection view (keys + derived expression
    columns) from a base-table stream: each micro-batch contributes its
    projected distinct rows, applied via the catalog's anti-join upsert —
    rows whose keys exist are replaced, new keys appended, and the view is
    never re-derived from the base table.

    `derived` maps output column → SQL expression over the batch columns
    (the `partsupp` discipline: the SAME expression strings build the full
    recompute and the incremental delta, so they cannot drift).  Replays are
    idempotent because re-upserting identical rows is a no-op by value."""
    exprs = list(keys) + [f"{expr} AS {col}" for col, expr in derived.items()]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        catalog.upsert(name, batch_df.selectExpr(*exprs).dropDuplicates(keys))

    writer = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
