"""Join strategies for scale (SURVEY.md §2.3 — the reference has no joins;
these are the Spark-native strategies traversals and pipelines compile to).

AQE's skew-join splitting handles most skew transparently; `salted_join` is
the explicit tool for the pathological case it can't fix: a *broadcast-
ineligible* build side whose join key has a few massive hot values (hub
vertices in a power-law graph, null-ish default keys in logs).  Salting
spreads each hot key over `salt` partitions by appending a random-ish salt
digit to the probe side and replicating the build side once per digit.

Measured (tools/skew_bench.py, SCALE.md "Skew & memory"): AQE skew-split
beats both plain and salted joins ~3x on a 20M-row power-law fixture at 25%
and 50% hub-key share; salting only crosses over the plain join at high
skew with a LOW salt count (x4), because build-side replication cost grows
linearly with `salt`.  Use AQE first; reach for salted_join where AQE
cannot fire — stream-stream joins, skew materializing in the join output,
or AQE-off environments — and keep `salt` small.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, on: str, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted `salt` ways.

    large gets a per-row salt in [0, salt); small is replicated salt times —
    so the shuffle key (on, salt) splits every hot key into `salt` buckets.
    Correct for inner/left joins where `small` has unique join keys (the
    dimension-table contract); the salt column never escapes.

    The salt is a deterministic hash of the row's hashable columns (not
    monotonically_increasing_id, which changes under task retry / AQE
    re-planning and would let a retried task salt rows differently than its
    first attempt).  Columns whose type contains a map ANYWHERE (top-level,
    array<map<...>>, struct fields) are excluded — F.hash rejects MapType at
    any nesting depth.  Known limitation: rows that are byte-identical across
    every hashed column all land in the same salt bucket, so a hot key made of
    EXACT duplicate rows is not split — pre-aggregate such duplicates (count
    them) before the join, which is the cheaper plan anyway."""
    hashable = [c for c, t in large.dtypes if "map<" not in t]
    if not hashable:
        raise ValueError("salted_join needs at least one non-map column to salt on")
    salted_large = large.withColumn(
        "__salt", (F.pmod(F.hash(*[F.col(c) for c in hashable]), F.lit(salt))).cast("int")
    )
    salts = small.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    replicated = small.crossJoin(salts)
    out = salted_large.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


def broadcast_semi_filter(large: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """Filter `large` to rows whose `on` appears in `keys` — broadcast
    left-semi, the shape every index lookup and id-list probe compiles to
    (the reference's S5 multi-id flat-map, TikvTable.java:177-184)."""
    return large.join(F.broadcast(keys.select(on).distinct()), on, "leftsemi")


def asof_join(left: DataFrame, right: DataFrame, by: str, time_col: str,
              right_value_cols: Sequence[str], tolerance_expr: str | None = None,
              suffix: str = "_right") -> DataFrame:
    """As-of join: for every left row, the LATEST right row of the same
    `by` key with right.time <= left.time — the time-series lookup Spark
    has no native operator for (last trade before each quote, feature
    snapshot as of each training example).

    Spark-native construction, no per-row Python: tag both sides, union on
    (by, time), and carry right values forward with
    `last(value, ignorenulls=True)` over (partition by `by` order by time,
    side) — one shuffle on the key, one within-partition sort, the same
    cost as a groupBy over the union.  That's the scalable distributed
    as-of shape: state per partition is a single running value, skew rides
    on the `by` key (salt upstream if one key dominates).  At equal
    timestamps the right row sorts FIRST, so a same-instant right row is
    visible to the left row (inclusive as-of), matching DuckDB's
    `ASOF JOIN ... ON l.t >= r.t` oracle semantics.

    Inner semantics: left rows with no prior right row are dropped (the
    DuckDB ASOF default).  `tolerance_expr` (e.g. "INTERVAL 10 MINUTES")
    additionally requires right.time >= left.time - tolerance.  Right rows
    must be unique per (by, time) — pre-aggregate otherwise (the
    deterministic contract; a multiset would make 'the' as-of row
    ambiguous in any engine)."""
    rt = f"{time_col}{suffix}"
    # NULL handling mirrors the DuckDB ASOF oracle (l.t >= r.t, equi on
    # `by`): a NULL never satisfies >= or =, so NULL-time right rows can
    # never be "the latest prior row", NULL-time left rows never match, and
    # NULL keys never join.  Without these filters the ASC window (nulls
    # first) would carry a NULL-time right struct into EVERY row of its key
    # partition, fabricating matches the oracle doesn't produce.
    left = left.filter(F.col(time_col).isNotNull() & F.col(by).isNotNull())
    right = right.filter(F.col(time_col).isNotNull() & F.col(by).isNotNull())
    # the right row travels as ONE struct: last(ignorenulls) then picks up
    # the whole as-of row atomically.  Carrying each value column in its own
    # last() would let a NULL in the true as-of row fall through to a STALE
    # value from an older row — fabricating a row that never existed (and
    # diverging from the native ASOF oracle, which returns the NULL).
    r_struct = F.struct(
        F.col(time_col).alias(rt),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols])
    l_tag = left.select(
        F.col(by).alias(by), F.col(time_col).alias(time_col), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (by, time_col)],
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(by).alias(by), F.col(time_col).alias(time_col), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, time_col)],
        r_struct.alias("__r"),
    )
    from pyspark.sql.window import Window

    w = (Window.partitionBy(by).orderBy(F.col(time_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried_struct = F.last(F.col("__r"), ignorenulls=True).over(w)
    out = (l_tag.unionByName(r_tag)
           .withColumn("__r", carried_struct)
           .filter(F.col("__side") == 1)
           .filter(F.col("__r").isNotNull())
           .select(by, time_col,
                   *[c for c in left.columns if c not in (by, time_col)],
                   F.col(f"__r.{rt}").alias(rt),
                   *[F.col(f"__r.{c}{suffix}").alias(f"{c}{suffix}")
                     for c in right_value_cols]))
    if tolerance_expr:
        out = out.filter(F.col(rt) >= F.col(time_col) - F.expr(tolerance_expr))
    return out


def range_bucket_join(facts: DataFrame, bounds: Sequence[float], value_col: str,
                      bucket_name: str = "bucket") -> DataFrame:
    """Assign each row to the bucket whose [bounds[i], bounds[i+1]) range
    holds value_col — the building block for range-partitioned co-location
    (the Spark-side analog of the reference's region-aligned shards, I1)."""
    expr = F.lit(len(bounds))  # overflow bucket
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(F.col(value_col) < F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return facts.withColumn(bucket_name, expr.cast("int"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          on: Sequence[str] = (),
                          bucket_width: int = 32,
                          how_overlap: str = "closed") -> DataFrame:
    """Interval overlap join — pairs every left row with every right row
    whose [start, end] interval overlaps it (closed-interval semantics:
    touching endpoints match), optionally under equi-keys `on`.  Spark has
    no interval-join operator; the naive formulation is a cross join (or a
    one-sided range join) that explodes quadratically.

    Bucket decomposition (the standard distributed range-join technique):
    each interval explodes into the fixed-width buckets it spans
    (`sequence(start DIV w, end DIV w)`), candidates meet in an EQUI-join
    on (keys…, bucket), and each true pair is kept exactly once — in the
    bucket of the LATER start (`greatest(l_start, r_start) DIV w`), which
    both sides provably span when the intervals overlap (floor is
    monotone: max(⌊a/w⌋,⌊b/w⌋) = ⌊max(a,b)/w⌋ ≤ ⌊min(e_l,e_r)/w⌋).  No
    distinct pass, no cross join; cost = Σ span/w replication plus one
    shuffle on (keys, bucket).

    Start/end columns are NUMERIC (cast dates to epoch days first — keeps
    the bucket arithmetic engine-portable).  `bucket_width` tunes the
    replication-vs-bucket-size trade: ~ the median interval length is the
    usual choice; intervals of length L explode into ≤ L/w + 2 rows.

    Column names must be disjoint across sides except the `on` keys.
    Returns all columns of both inputs, keys once."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if how_overlap != "closed":
        raise ValueError("only closed-interval semantics are implemented")
    w = F.lit(int(bucket_width))
    on = list(on)
    # integer bucket arithmetic: cast-to-long of a division is NOT floor
    # for negatives — use floor division explicitly
    lb = left.withColumn(
        "_bk", F.explode(F.sequence(
            F.floor(F.col(l_start) / w).cast("long"),
            F.floor(F.col(l_end) / w).cast("long"))))
    rb = right.withColumn(
        "_bk", F.explode(F.sequence(
            F.floor(F.col(r_start) / w).cast("long"),
            F.floor(F.col(r_end) / w).cast("long"))))
    pairs = lb.join(rb, on + ["_bk"])
    keep = (
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (F.col("_bk")
           == F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w)
           .cast("long"))
    )
    return pairs.filter(keep).drop("_bk")
