"""Optimizer statistics: join-cardinality estimation and key containment
— the ANALYZE-side numbers a planner (or a human sizing a 100 TB join)
needs BEFORE running the join.

Three tiers:

* `join_size_exact` — Σ_k c_a(k)·c_b(k): the true output row count of an
  inner equi-join, computed from the two per-key count tables (each a
  map-side-combinable aggregate) joined on the (much smaller) distinct
  key sets — never materializing the join itself.
* `join_size_kmv` — the same product sum over a COORDINATED bottom-k
  (KMV / k-minimum-values) sample of the key domain: both sides keep
  only keys whose md5 ranks among the union's k smallest, and the
  matched product sum is scaled by the inverse sampling fraction
  (Beyer et al. 2007).  Because the rank function is md5 — not a seeded
  RNG — the estimate is DETERMINISTIC and engine-reproducible: the
  driver hash-checks the estimate itself, not just its error band.
* `key_containment` — |distinct(A) ∩ distinct(B)| / |distinct(A)|: the
  foreign-key-discovery score (1.0 = every A key resolves in B), exact
  integers plus one float division.

Scale shape: per-key counts are partial-aggregated; the KMV cut is a
TakeOrdered over (hash, key) — k rows per side cross the wire, so the
estimator costs O(k log k) network regardless of table size.  The hash
rank inherits the repo's md5-only portability contract.

Reference parity: the reference's metrics/statistics surface is a stub
(SURVEY.md I2); this is the Spark-first replacement a real deployment
needs for join planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rank(col) -> F.Column:
    """Portable deterministic 60-bit rank: md5-prefix of the key string.
    (15 hex chars = 60 bits — fits a BIGINT exactly, same trick as the
    repo's H60 hashes.)"""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def key_counts(df: DataFrame, key: str) -> DataFrame:
    """(key, c) per-key row counts — NULL keys dropped (they never join)."""
    return (df.filter(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def join_size_exact(a: DataFrame, b: DataFrame, key_a: str,
                    key_b: str | None = None) -> DataFrame:
    """1 row: (join_rows, n_keys_a, n_keys_b, n_keys_both) — the exact
    inner-equi-join output size Σ c_a·c_b without running the join."""
    key_b = key_b or key_a
    ca, cb = key_counts(a, key_a), key_counts(b, key_b)
    both = ca.join(cb.withColumnRenamed("c", "c_b"), "k")
    stats = both.agg(
        F.coalesce(F.sum(F.col("c") * F.col("c_b")), F.lit(0)).cast("long")
        .alias("join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys_both"))
    na = ca.agg(F.count(F.lit(1)).cast("long").alias("n_keys_a"))
    nb = cb.agg(F.count(F.lit(1)).cast("long").alias("n_keys_b"))
    return (stats.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
            .select("join_rows", "n_keys_a", "n_keys_b", "n_keys_both"))


def join_size_kmv(a: DataFrame, b: DataFrame, key_a: str,
                  key_b: str | None = None, k: int = 256,
                  scale: int = 1_000_000) -> DataFrame:
    """1 row: (estimate_scaled, sampled_product, n_sampled, threshold_rank)
    — the KMV join-size estimate over the k minimum-rank keys of the
    UNION key domain.  estimate_scaled = sampled_product · |domain-seen|
    · scale DIV n_sampled as an exact integer (one floor division), so
    the driver can hash-check it; divide by `scale` for the estimate.

    Coordinated sampling: both sides are filtered by the SAME rank
    threshold (the k-th smallest rank over the union of distinct keys),
    so matching keys are sampled together — the property that makes the
    product sum unbiased for joins."""
    key_b = key_b or key_a
    ca, cb = key_counts(a, key_a), key_counts(b, key_b)
    domain = (ca.select("k").unionByName(cb.select("k")).distinct()
              .withColumn("r", _rank(F.col("k"))))
    kth = (domain.orderBy("r").limit(k)
           .agg(F.max("r").alias("r_max"),
                F.count(F.lit(1)).cast("long").alias("n_sampled")))
    n_domain = domain.agg(F.count(F.lit(1)).cast("long").alias("n_domain"))
    sampled = (domain.crossJoin(F.broadcast(kth))
               .filter(F.col("r") <= F.col("r_max")).select("k"))
    prod = (sampled.join(ca, "k").join(cb.withColumnRenamed("c", "c_b"), "k")
            .agg(F.coalesce(F.sum(F.col("c") * F.col("c_b")), F.lit(0))
                 .cast("long").alias("sampled_product")))
    return (prod.crossJoin(F.broadcast(kth)).crossJoin(F.broadcast(n_domain))
            .select(
                F.expr(f"(sampled_product * n_domain * {scale}) "
                       f"DIV n_sampled").cast("long")
                .alias("estimate_scaled"),
                "sampled_product", "n_sampled",
                F.col("r_max").cast("long").alias("threshold_rank")))


def key_containment(a: DataFrame, b: DataFrame, key_a: str,
                    key_b: str | None = None) -> DataFrame:
    """1 row: (n_keys_a, n_contained, containment) — the fraction of A's
    distinct keys that resolve in B.  containment == 1.0 flags a
    foreign-key candidate; exact integers, one float division."""
    key_b = key_b or key_a
    da = (a.filter(F.col(key_a).isNotNull())
          .select(F.col(key_a).alias("k")).distinct())
    db = (b.filter(F.col(key_b).isNotNull())
          .select(F.col(key_b).alias("k")).distinct())
    hit = da.join(db, "k", "left_semi") \
        .agg(F.count(F.lit(1)).cast("long").alias("n_contained"))
    tot = da.agg(F.count(F.lit(1)).cast("long").alias("n_keys_a"))
    return (hit.crossJoin(F.broadcast(tot))
            .select("n_keys_a", "n_contained",
                    (F.col("n_contained").cast("double")
                     / F.col("n_keys_a")).alias("containment")))


def skew_report(df: DataFrame, key: str, top: int = 10,
                shuffle_partitions: int = 200) -> DataFrame:
    """Join/aggregation skew diagnosis for a key column: the numbers that
    decide between plain shuffle, AQE skew-split, and salting (see
    SCALE.md's measured crossover).  One row per hot key (top-`top` by
    count, ties to MIN key string) plus one 'summary' row.

    Columns: tag ('hot'|'summary'), key_str, n_rows, share_ppm (exact
    integer parts-per-million of the table), salt_factor — for hot rows,
    ceil(n_rows / ideal_partition_rows): the replication factor that
    would level this key across tasks (1 = no action needed).

    All exact integers (counts, floor divisions); deterministic top-k
    cut.  Scale shape: one combinable groupBy + a TakeOrdered — the same
    cost as any key-count pass."""
    counts = key_counts(df, key).select(
        F.col("k").cast("string").alias("key_str"),
        F.col("c").alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").cast("long").alias("n_total"),
                     F.count(F.lit(1)).cast("long").alias("n_keys"),
                     F.max("n_rows").cast("long").alias("max_rows"))
    hot = (counts.orderBy(F.desc("n_rows"), F.asc("key_str")).limit(top)
           .crossJoin(F.broadcast(tot)))
    # all-integer ceil divisions: (a + b - 1) DIV b — no float in any
    # checked column, so the report hash-matches any ANSI replay
    ideal_sql = (f"((n_total + {shuffle_partitions - 1}) "
                 f"DIV {shuffle_partitions})")
    hot_rows = hot.select(
        F.lit("hot").alias("tag"), "key_str", "n_rows",
        F.expr("(n_rows * 1000000) DIV n_total").cast("long")
        .alias("share_ppm"),
        F.expr(f"(n_rows + {ideal_sql} - 1) DIV {ideal_sql}").cast("long")
        .alias("salt_factor"))
    summary = tot.select(
        F.lit("summary").alias("tag"),
        F.col("n_keys").cast("string").alias("key_str"),
        F.col("n_total").alias("n_rows"),
        F.expr("(max_rows * 1000000) DIV n_total").cast("long")
        .alias("share_ppm"),
        F.expr(f"(max_rows + {ideal_sql} - 1) DIV {ideal_sql}").cast("long")
        .alias("salt_factor"))
    return hot_rows.unionByName(summary)
