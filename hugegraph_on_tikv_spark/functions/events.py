"""Event-sequence analytics: cohort retention and funnels.

The classic product-analytics queries over an event stream — the batch
forms here are plain DataFrame aggregations (one or two shuffles keyed by
user), so they scale like any groupBy: no per-user iteration, no
driver-side state.  Counts are exact integers and period arithmetic is
date_trunc/datediff, so both are oracle-checkable verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(events: DataFrame, granularity: str = "week",
                     id_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Retention triangle: users grouped by first-activity period
    ("cohort"), counted per period-offset of later activity.  Returns
    (cohort, period_offset, n_users): of the users whose first event fell
    in `cohort`, `n_users` were active `period_offset` periods later
    (offset 0 is the cohort itself).

    Two aggregations: min-period per user (the cohort assignment), then a
    distinct (user, period) activity set joined back and counted — all
    keyed by user/cohort, map-side combinable.  Supported granularity:
    'week' (ISO Monday weeks, identical in Spark and DuckDB) or 'day'."""
    if granularity not in ("week", "day"):
        raise ValueError("granularity must be 'week' or 'day'")
    days = 7 if granularity == "week" else 1
    period = F.date_trunc(granularity, F.col(ts_col))
    firsts = (events.groupBy(F.col(id_col).alias("u"))
              .agg(F.min(period).alias("cohort")))
    acts = (events.select(F.col(id_col).alias("u"), period.alias("period"))
            .distinct())
    return (
        acts.join(firsts, "u")
        .select("u", "cohort",
                (F.datediff(F.col("period"), F.col("cohort")) / days)
                .cast("int").alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col("u")).alias("n_users"))
    )


def funnel_counts(events: DataFrame, steps: tuple[str, ...] =
                  ("view", "click", "purchase"), horizon_days: int = 7,
                  id_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Funnel completion: per step k, how many users performed step 0 and
    then each subsequent step STRICTLY AFTER their previous step's
    completion time, with the whole funnel inside `horizon_days` of their
    step-0 time.  Completion time per step = the EARLIEST qualifying
    event (the standard first-touch funnel), which makes the whole chain
    deterministic.  Returns (step_index, step, n_users).

    One min-aggregation per step over the type-filtered events (each is a
    filtered scan + groupBy user), chained by a broadcast-friendly join on
    user — no window over the whole event stream and nothing quadratic."""
    uid = F.col(id_col).alias("u")
    reached = (events.filter(F.col(type_col) == steps[0])
               .groupBy(uid).agg(F.min(ts_col).alias("t0"))
               .withColumn("deadline",
                           F.col("t0") + F.expr(f"INTERVAL {horizon_days} DAYS"))
               .withColumn("prev_t", F.col("t0")))
    out_rows = [("0", steps[0], reached)]
    for k, step in enumerate(steps[1:], start=1):
        ev = events.filter(F.col(type_col) == step).select(
            uid, F.col(ts_col).alias("_ts"))
        reached = (
            ev.join(reached.select("u", "t0", "deadline", "prev_t"), "u")
            .filter((F.col("_ts") > F.col("prev_t"))
                    & (F.col("_ts") <= F.col("deadline")))
            .groupBy("u", "t0", "deadline")
            .agg(F.min("_ts").alias("prev_t"))
        )
        out_rows.append((str(k), step, reached))
    parts = []
    for idx, step, df in out_rows:
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n_users"))
            .select(F.lit(int(idx)).alias("step_index"),
                    F.lit(step).alias("step"), "n_users"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def event_transitions(events: DataFrame, id_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      seq_col: str = "event_id") -> DataFrame:
    """First-order transition matrix of the per-user event sequence: for
    every consecutive pair in each user's time-ordered stream, count
    (from_type, to_type) and derive the row-normalized transition
    probability — the Markov-chain view product analytics builds journey
    maps from.

    Ordering is (ts, seq_col) so simultaneous events are deterministic.
    One window keyed BY USER (bounded per-user partitions — the stream of
    a single user fits a task by contract; there is no global window) and
    one pair-count aggregation, map-side combinable.  `p` is one division
    of exact integers, rounded to 6dp for cross-engine equality.
    Returns (from_type, to_type, n, p)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col(ts_col), F.col(seq_col))
    pairs = (events
             .select(F.col(type_col).alias("from_type"),
                     F.lead(type_col).over(w).alias("to_type"))
             .filter(F.col("to_type").isNotNull()))
    counts = (pairs.groupBy("from_type", "to_type")
              .agg(F.count(F.lit(1)).alias("n")))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (counts.join(totals, "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("_tot"), 6).alias("p")))
