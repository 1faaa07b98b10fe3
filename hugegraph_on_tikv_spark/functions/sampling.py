"""Deterministic corpus sampling — the dataset-assembly ops a training-data
pipeline runs after dedup/quality filtering.

Everything here is HASH-driven, never `rand()`: a row's fate is a pure
function of its id (+ an explicit salt), so splits are reproducible across
runs, engines, cluster sizes, and partitionings — the property training
pipelines actually need ("the val set is the same val set next month").
Hashes are md5-derived (first 48 bits), matching the engine-wide portable
hash contract (functions/hashing.py / oracles.H48_SQL), so every operator
here has an exact DuckDB oracle.

Scale shapes:
* `split_assign` / `stratified_sample` are pure column expressions — no
  shuffle, no state, whole-stage codegen; they scale like a filter.
* `cap_per_group` is a per-group top-k: one shuffle on the group key, and
  the rank filter is a WindowGroupLimit in the physical plan, so each
  partition keeps only `cap` rows per group during the sort — the classic
  "cap documents per domain" op without materializing full groups.  Skewed
  hot groups are exactly the rows the cap discards, and the group-limit
  push-down drops them before they can spill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # hash-bucket resolution: weights quantize to 0.01%


def _bucket(id_col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS): first 48 md5 bits of
    (id || salt), mod BUCKETS.  Mirrors oracles.H48_SQL exactly."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 12),
        16, 10).cast("long")
    return h % BUCKETS


def split_assign(df: DataFrame, weights: dict[str, float],
                 id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash
    bucket: cumulative weight thresholds over `_bucket`.  Weights must sum
    to 1 (±rounding); each quantizes to 1/BUCKETS.  Adding rows later never
    moves an existing row's split (id-pure); changing `salt` reshuffles
    all assignments at once."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = _bucket(F.col(id_col), salt)
    expr, cum = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def split_sql(weights: dict[str, float], id_col: str = "doc_id",
              salt: str = "") -> str:
    """The DuckDB twin of split_assign's `split` column (oracle builder)."""
    h = (f"CAST(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '{salt}'),"
         f" 1, 12)) AS UBIGINT) AS BIGINT) % {BUCKETS}")
    names = list(weights)
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {h} < {int(round(cum * BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def cluster_safe_split(docs: DataFrame, weights: dict[str, float],
                       clusters: DataFrame, id_col: str = "doc_id",
                       salt: str = "") -> DataFrame:
    """Leakage-safe split: every member of a near-duplicate cluster lands
    in the SAME split, so a train/test boundary can never cut through a
    pair of near-identical documents (the contamination mode
    cross_corpus_contamination detects — this op prevents it at split
    time).  `clusters` is (doc_id, cluster_id) from
    dedup.near_duplicate_clusters; unclustered docs are their own
    singleton group (group key = own id), keeping split_assign's
    append-stability for everything outside a cluster.

    Scale: the clusters table holds only near-dup members — a small
    fraction of any curated corpus — so the join broadcasts; the split
    itself stays a pure hash-column expression (no shuffle)."""
    joined = docs.select(F.col(id_col)).join(
        F.broadcast(clusters), id_col, "left_outer")
    grouped = joined.withColumn(
        "_group", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    return (split_assign(grouped, weights, id_col="_group", salt=salt)
            .select(id_col, "cluster_id", "split"))


def stratified_sample(df: DataFrame, fraction: float,
                      id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose bucket falls
    under `fraction`.  Unlike `df.sample()`, re-running (on any cluster, any
    partitioning) keeps exactly the same rows, and a second sample with a
    different salt is independent of the first."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(F.col(id_col), salt) < int(round(fraction * BUCKETS)))


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep at most `cap` rows per group, chosen deterministically (by hash
    of id, tie-broken by id) — the standard over-represented-domain
    downsampler.  The hash order makes the kept set a uniform-ish draw from
    each group rather than 'first cap by storage order', and it is stable
    under recomputation."""
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def mix_corpus(df: DataFrame, domain_col: str, weights: dict[str, float],
               total: int, id_col: str = "doc_id",
               salt: str = "") -> DataFrame:
    """Deterministic corpus MIXING: assemble a ~`total`-row dataset whose
    domain composition follows `weights` (the data-mixture step training
    recipes specify as "40% web, 30% code, 30% books").

    Per domain d the target is cap_d = round(total · w_d / Σw); the kept
    rows are the first cap_d of the domain in (id-hash, id) order — the
    same uniform-draw-by-hash contract as cap_per_group, so the mixture is
    reproducible across runs, engines, and partitionings, and re-mixing
    with a different `total` keeps the smaller mixture as a PREFIX of the
    larger (hash order does not depend on the cap).  A domain with fewer
    rows than its cap contributes everything it has — the result is then
    smaller than `total`, never silently back-filled from other domains
    (mixture proportions are a contract; violating them quietly is worse
    than a short dataset).  Domains absent from `weights` are dropped.

    Scale: one window shuffle on the domain key with the rank filter
    WindowGroupLimit-pushed (rows past the cap are discarded during the
    sort, not materialized), plus a broadcast literal CASE for the caps —
    no driver-side counts needed."""
    from pyspark.sql.window import Window

    if total < 1:
        raise ValueError("total must be >= 1")
    if not weights:
        raise ValueError("weights must be non-empty")
    norm = sum(weights.values())
    if norm <= 0:
        raise ValueError("weights must sum to a positive value")
    caps = {d: int(round(total * w / norm)) for d, w in weights.items()}
    return _apply_domain_caps(df, domain_col, caps, id_col, salt)


def _apply_domain_caps(df: DataFrame, domain_col: str, caps: dict[str, int],
                       id_col: str, salt: str) -> DataFrame:
    """Keep the first cap_d rows of each domain in (id-hash, id) order —
    the shared tail of mix_corpus / temperature_mix."""
    from pyspark.sql.window import Window

    cap_expr = F.lit(None).cast("long")
    for d, c in caps.items():
        cap_expr = F.when(F.col(domain_col) == d, F.lit(c)).otherwise(cap_expr)
    w = Window.partitionBy(domain_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col))
    # drop unlisted domains with an explicit isin — unlike the CASE-derived
    # cap null-check, this predicate PUSHES to the scan (partition /
    # row-group pruning on the domain column at scale)
    return (df.filter(F.col(domain_col).isin(*caps))
            .withColumn("_cap", cap_expr)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_cap"))
            .drop("_cap", "_rn"))


def mix_sql(domain_col: str, weights: dict[str, float], total: int,
            id_col: str = "doc_id", salt: str = "",
            table: str = "documents") -> str:
    """DuckDB twin of mix_corpus (same md5 bucket, same caps)."""
    norm = sum(weights.values())
    caps = {d: int(round(total * w / norm)) for d, w in weights.items()}
    cap_case = "CASE " + " ".join(
        f"WHEN {domain_col} = '{d}' THEN {c}" for d, c in caps.items()
    ) + " END"
    h = (f"CAST(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || "
         f"'{salt}'), 1, 12)) AS UBIGINT) AS BIGINT) % {BUCKETS}")
    return f"""
    SELECT * EXCLUDE (_cap, _rn) FROM (
      SELECT *, {cap_case} AS _cap,
             row_number() OVER (PARTITION BY {domain_col}
                                ORDER BY {h}, {id_col}) AS _rn
      FROM {table})
    WHERE _cap IS NOT NULL AND _rn <= _cap
    """


def weighted_sample(df: DataFrame, weight_col: str,
                    id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic weighted Bernoulli: keep each row with probability
    equal to its `weight_col` (clamped to [0, 1]) — the quality-weighted
    corpus downsampler ("keep high-quality documents more often").  The
    draw is the row's id-hash bucket, so it is reproducible and
    independent of the weights: re-scoring documents changes only the rows
    whose keep-threshold crossed their (fixed) bucket, not the whole
    sample.  Pure column arithmetic — zero shuffle."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    # explicit IsNotNull on the id pushes to the scan (the hash-threshold
    # expression never can); a NULL id hashed to NULL was dropped by the
    # comparison anyway, so semantics are unchanged
    return (df.filter(F.col(id_col).isNotNull())
            .filter(_bucket(F.col(id_col), salt) < (w * BUCKETS).cast("long")))


def temperature_mix(df: DataFrame, domain_col: str, total: int,
                    alpha: float = 0.5, id_col: str = "doc_id",
                    salt: str = "") -> DataFrame:
    """Temperature-flattened corpus mixture — the multilingual/multi-domain
    p^α rebalance (mT5, XLM-R style): domain d's share of the ~`total`-row
    output is proportional to count_d^α, upweighting tail domains without
    letting any head domain dominate.  α=1 reproduces natural proportions,
    α→0 approaches uniform.

    The observed per-domain counts are ONE small aggregate (domains are
    tens, not millions — metadata-sized collect by contract); the caps
    then drive the same hash-order WindowGroupLimit cut as mix_corpus.

    Determinism/oracle contract: at the default α=0.5 the weights are
    math.isqrt(count) — INTEGER square roots — and caps are
    floor(total·w_d/Σw) in exact integer arithmetic, so a SQL engine
    replays the whole computation bit-for-bit (temperature_mix_sql);
    libm pow() is engine-divergent, so other α values compute caps with
    Python floats driver-side (still reproducible run-to-run: the caps
    are literals in the plan) but carry no exactness guarantee for
    cross-engine replay.

    COMPOSITION WARNING: every hash-driven stage in this module
    (cap_per_group, mix/temperature_mix, split_assign) ranks or buckets
    by the SAME id hash.  Chaining two stages with the same salt makes
    the second see exactly the first's smallest-bucket prefix — e.g. a
    mix followed by a same-salt 80/10/10 split puts EVERY mixed doc in
    'train' (the kept docs are precisely the ones whose bucket is below
    every threshold).  Give each pipeline stage its own salt;
    tests/test_sampling.py pins the failure mode."""
    import math

    if total < 1:
        raise ValueError("total must be >= 1")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = {r["d"]: r["c"] for r in
              df.groupBy(F.col(domain_col).alias("d"))
              .agg(F.count(F.lit(1)).alias("c")).collect()}
    if not counts:
        return df.filter(F.lit(False))
    if alpha == 0.5:
        iw = {d: math.isqrt(int(c)) for d, c in counts.items()}
        s = sum(iw.values())
        caps = {d: (total * w) // s for d, w in iw.items()}
    else:
        fw = {d: float(c) ** alpha for d, c in counts.items()}
        s = sum(fw[d] for d in sorted(fw))
        caps = {d: int(total * w / s) for d, w in fw.items()}
    return _apply_domain_caps(df, domain_col, caps, id_col, salt)


def temperature_mix_sql(domain_col: str, total: int, id_col: str = "doc_id",
                        salt: str = "", table: str = "documents") -> str:
    """DuckDB twin of temperature_mix(alpha=0.5): integer-sqrt weights,
    floor-division caps, same md5 hash order."""
    h = (f"CAST(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || "
         f"'{salt}'), 1, 12)) AS UBIGINT) AS BIGINT) % {BUCKETS}")
    return f"""
    WITH _cnts AS (
      SELECT {domain_col} AS _d, CAST(count(*) AS BIGINT) AS _c
      FROM {table} GROUP BY 1
    ), _w AS (
      SELECT _d, CAST(floor(sqrt(_c)) AS BIGINT) AS _iw FROM _cnts
    ), _s AS (
      SELECT CAST(SUM(_iw) AS BIGINT) AS _tot FROM _w
    ), _caps AS (
      SELECT _d, (CAST({total} AS BIGINT) * _iw) // _tot AS _cap
      FROM _w CROSS JOIN _s
    ), _rn AS (
      SELECT *, row_number() OVER (PARTITION BY {domain_col}
                                   ORDER BY {h}, {id_col}) AS _r
      FROM {table}
    )
    SELECT * EXCLUDE (_r, _d, _cap)
    FROM _rn JOIN _caps ON {domain_col} = _d
    WHERE _r <= _cap
    """


def _h48(id_col: Column, salt: str) -> Column:
    """Full 48-bit md5 hash of (id || salt) — the portable shuffle key
    (mirrors oracles.H48_SQL with a salt suffix)."""
    return F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))),
                    1, 12), 16, 10).cast("long")


def training_order(df: DataFrame, n_shards: int = 64, salt: str = "",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order permutation WITHOUT a global
    single-partition window — the op every epoch of training consumes.

    Each row gets a pseudorandom 48-bit shuffle key; rows land in
    `shard = key % n_shards` with `pos` = their (key, id)-rank INSIDE the
    shard (one window per shard partition, parallel across shards).  Two
    total orders are derived, both exact integers:

    * `read_pos`  = pos * n_shards + shard — ROUND-ROBIN interleave: a
      sequential reader alternates shards, so early-training batches mix
      the whole corpus even when shards are written separately.  A strict
      total order (unique), dense only when shards are equal-sized.
    * `block_pos` = shard_offset + pos — BLOCKED concatenation (shard 0's
      rows first), dense 0..n-1; shard offsets come from one tiny
      n_shards-row cumulative sum, the pack_token_ids placement trick.

    100 TB posture: the only per-row shuffle is the shard partitioning;
    windows run per shard (parallel) and over the n_shards-row offset
    table (driver-scale).  No rand(), so re-runs and engines agree."""
    h = _h48(F.col(id_col), salt)
    from pyspark.sql.window import Window

    keyed = df.withColumn("_k", h).withColumn(
        "shard", (F.col("_k") % n_shards).cast("long"))
    wpos = Window.partitionBy("shard").orderBy(F.col("_k").asc(),
                                               F.col(id_col).asc())
    pos = keyed.withColumn("pos", (F.row_number().over(wpos) - 1)
                           .cast("long"))
    sizes = pos.groupBy("shard").agg(F.count(F.lit(1)).alias("_n"))
    woff = (Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = sizes.select(
        "shard",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).cast("long")
        .alias("_off"))
    return (pos.join(F.broadcast(offs), "shard")
            .select(id_col, "shard", "pos",
                    (F.col("pos") * n_shards + F.col("shard")).cast("long")
                    .alias("read_pos"),
                    (F.col("_off") + F.col("pos")).cast("long")
                    .alias("block_pos")))


def token_budget_select(df: DataFrame, budget: int, quality_col: str,
                        token_col: str, id_col: str = "doc_id",
                        band_width: int = 10_000) -> DataFrame:
    """Greedy quality-first corpus selection under a token budget: order
    docs by (quality DESC, id ASC) and keep the maximal prefix whose
    token sum stays <= budget — "take the best data until the budget is
    spent", the assembly step after quality scoring.

    `quality_col` must be an exact INTEGER score (callers scale floats
    themselves) so the order and the sums replay bit-exactly.

    100 TB posture — no global sort, no single-partition window: docs are
    banded by `quality // band_width`; per-band token totals (a tiny
    aggregate) locate the cutoff band via a cumulative over the band
    table, and a broadcast join tags every kept band with its strictly-
    better-bands offset.  EVERY kept band then runs a per-band window —
    partitioned by band, ordered (quality DESC, id) — because the output
    contract includes `spent`, the running total through each row; only
    the cutoff band USES it to trim to the affordable prefix, but whole
    bands need it for the returned column too.  The windows are parallel
    across bands (band_width bounds each partition's size — no global or
    single-partition window anywhere).  Work on the big table is one
    groupBy + one broadcast-join filter + one band-partitioned window.

    Returns the kept rows as (id, quality, tokens, spent) where `spent`
    is the running total through that row (spent <= budget always)."""
    from pyspark.sql.window import Window

    q = F.col(quality_col).cast("long")
    t = F.col(token_col).cast("long")
    base = df.select(F.col(id_col).alias("id"), q.alias("quality"),
                     t.alias("tokens"),
                     (q / F.lit(band_width)).cast("long").alias("band"))
    bands = base.groupBy("band").agg(F.sum("tokens").alias("_bt"))
    wcum = (Window.orderBy(F.col("band").desc())
            .rowsBetween(Window.unboundedPreceding, -1))
    # _before = tokens in strictly-better bands; a band is WHOLLY kept when
    # _before + its own total fits, PARTIAL when _before alone still fits
    cum = bands.select(
        "band", "_bt",
        F.coalesce(F.sum("_bt").over(wcum), F.lit(0)).cast("long")
        .alias("_before"))
    whole = cum.filter(F.col("_before") + F.col("_bt") <= budget) \
        .select("band", F.col("_before").alias("_off"), F.lit(False).alias("_partial"))
    partial = (cum.filter((F.col("_before") <= budget)
                          & (F.col("_before") + F.col("_bt") > budget))
               .select("band", F.col("_before").alias("_off"),
                       F.lit(True).alias("_partial")))
    cand = base.join(F.broadcast(whole.unionByName(partial)), "band")
    wband = (Window.partitionBy("band")
             .orderBy(F.col("quality").desc(), F.col("id").asc()))
    spent = cand.withColumn(
        "spent", (F.col("_off") + F.sum("tokens").over(wband)).cast("long"))
    return (spent.filter((~F.col("_partial")) | (F.col("spent") <= budget))
            .select("id", "quality", "tokens", "spent"))


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

DSIR_SCALE = 1_000_000
_U48_DENOM = float(2 ** 48 + 1)  # exactly representable double (< 2^53)


def _dsir_grams(text_col: Column) -> Column:
    """Unigrams + space-joined bigrams of the engine tokenizer — the
    hashed n-gram feature set DSIR fits its bag-of-words models on."""
    from .text import tokens

    t = tokens(text_col)
    bi = (F.when(F.size(t) >= 2,
                 F.zip_with(F.slice(t, 1, F.size(t) - 1),
                            F.slice(t, 2, F.size(t) - 1),
                            lambda a, b: F.concat(a, F.lit(" "), b)))
          .otherwise(F.array().cast("array<string>")))
    return F.concat(t, bi)


def _dsir_buckets(df: DataFrame, text_col: str, id_col: str,
                  n_buckets: int, salt: str) -> DataFrame:
    """(id, b): one row per gram OCCURRENCE, b = 60-bit md5 bucket."""
    from .hashing import md5_long

    return (df.select(F.col(id_col).alias("id"),
                      F.explode(_dsir_grams(F.col(text_col))).alias("_g"))
            .select("id",
                    (md5_long(F.concat(F.lit(salt + "|"), F.col("_g")))
                     % n_buckets).alias("b")))


def dsir_select(docs: DataFrame, target: DataFrame, n: int,
                source: DataFrame | None = None, n_buckets: int = 512,
                add_k: int = 1, text_col: str = "text",
                id_col: str = "doc_id", salt: str = "dsir") -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    pick the `n` pool documents whose hashed-n-gram distribution looks
    most like a small high-quality TARGET corpus, with Gumbel-top-k
    noise so the selection is a sample from the importance weights, not
    a brittle argmax.

    Model: unigram+bigram features hash into `n_buckets` buckets; the
    target and source (raw pool) bucket distributions get add-k
    smoothing; a document's log importance weight is

        sum over gram occurrences of  [log p_target(b) - log p_source(b)]

    Exact-integer contract (the lm.py / unigram.py recipe): each
    bucket's two log-probs are floored at 1e-6 resolution —
    ``floor(ln((c_b+k)/(T+k*B)) * 1e6)`` as BIGINT — so the per-bucket
    score and every per-doc sum are integer arithmetic a SQL engine
    replays bit-for-bit (dsir_sql); only the one ln per bucket touches
    libm, same floor-boundary exposure unigram.py already pins.
    Gumbel noise is deterministic too: u = (h48+1)/(2^48+1) from the
    48-bit md5 of (id || '#' || salt) — every value < 2^53 so the
    float pipeline is pure IEEE ops both engines execute identically —
    and g = floor(-ln(-ln(u)) * 1e6).  Selection key: logw_scaled + g,
    ties broken by id.

    100 TB posture: both models aggregate to <= n_buckets rows
    (map-side partial combine into a few-KB table) and their join is
    BROADCAST into the doc-side scoring; the pool's only shuffles are
    the per-(doc,bucket) then per-doc aggregations, and the final cut
    is orderBy().limit(n) — a TakeOrdered (per-partition top-n +
    driver merge of n rows), never a global sort.  No collect of
    anything document-sized; the target corpus may itself be large
    (only its B-row histogram ever leaves the aggregation).

    `source` defaults to `docs` (the pool IS the raw distribution —
    the paper's setting); pass it explicitly when scoring a pre-filtered
    pool against the original raw histogram.  Buckets never seen by
    EITHER model cannot occur in pool docs drawn from the source
    distribution; callers scoring out-of-pool text should pass that
    text's corpus as `source`.

    Returns (doc_id, logw_scaled, gumbel_scaled) for the selected n.
    Reference parity: none — north-star training-data-pipeline surface
    (the brief's data-selection family; complements token_budget_select's
    quality-prefix cut with distribution matching)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n_buckets < 2 or add_k < 1:
        raise ValueError("need n_buckets >= 2 and integer add_k >= 1")
    src = docs if source is None else source
    B, k = n_buckets, add_k

    ct = (_dsir_buckets(target, text_col, id_col, B, salt)
          .groupBy("b").agg(F.count(F.lit(1)).alias("ct")))
    cs = (_dsir_buckets(src, text_col, id_col, B, salt)
          .groupBy("b").agg(F.count(F.lit(1)).alias("cs")))
    tt = ct.agg(F.sum("ct").cast("long").alias("tt"))
    ts = cs.agg(F.sum("cs").cast("long").alias("ts"))

    def _lp(cnt: Column, tot: Column) -> Column:
        return F.floor(F.log((cnt + F.lit(k)) / (tot + F.lit(k * B)))
                       * DSIR_SCALE).cast("long")

    score = (ct.join(cs, "b", "full").crossJoin(tt).crossJoin(ts)
             .select("b",
                     (_lp(F.coalesce(F.col("ct"), F.lit(0)), F.col("tt"))
                      - _lp(F.coalesce(F.col("cs"), F.lit(0)), F.col("ts")))
                     .alias("s")))

    per = (_dsir_buckets(docs, text_col, id_col, B, salt)
           .groupBy("id", "b").agg(F.count(F.lit(1)).alias("nb")))
    logw = (per.join(F.broadcast(score), "b")
            .groupBy("id")
            .agg(F.sum(F.col("nb") * F.col("s")).cast("long").alias("lw")))

    h48 = F.conv(F.substring(
        F.md5(F.concat(F.col("id").cast("string"), F.lit("#" + salt))),
        1, 12), 16, 10).cast("long")
    u = (h48 + F.lit(1)) / F.lit(_U48_DENOM)
    gum = F.floor(-F.log(-F.log(u)) * DSIR_SCALE).cast("long")

    keyed = (docs.select(F.col(id_col).alias("id"))
             .join(logw, "id", "left")
             .select("id",
                     F.coalesce("lw", F.lit(0)).cast("long")
                     .alias("logw_scaled"),
                     gum.alias("gumbel_scaled")))
    return (keyed
            .orderBy((F.col("logw_scaled") + F.col("gumbel_scaled")).desc(),
                     F.col("id").asc())
            .limit(n)
            .select(F.col("id").alias(id_col), "logw_scaled",
                    "gumbel_scaled"))


def dsir_sql(n: int, target_where: str, n_buckets: int = 512,
             add_k: int = 1, text_col: str = "text", id_col: str = "doc_id",
             salt: str = "dsir", table: str = "documents") -> str:
    """DuckDB twin of dsir_select with source = the whole `table` and
    target = rows satisfying `target_where` — same hashed buckets,
    floored log-probs, Gumbel keys, and (key DESC, id) cut."""
    from ..oracles import TOKENS_SQL

    toks = TOKENS_SQL.format(col=text_col)
    bkt = (f"CAST(CAST(('0x' || substr(md5('{salt}|' || _g), 1, 15)) "
           f"AS UBIGINT) AS BIGINT) % {n_buckets}")
    h48 = (f"CAST(CAST(('0x' || substr(md5(CAST(_id AS VARCHAR) || "
           f"'#{salt}'), 1, 12)) AS UBIGINT) AS BIGINT)")
    k, B, sc = add_k, n_buckets, DSIR_SCALE

    def _lp(cnt: str, tot: str) -> str:
        return (f"CAST(floor(ln(({cnt} + {k}) / ({tot} + {k * B})) "
                f"* {sc}) AS BIGINT)")

    return f"""
    WITH _tk AS (
      SELECT {id_col} AS _id, {toks} AS _t, ({target_where}) AS _is_t
      FROM {table}
    ), _gb AS (
      SELECT _id, _is_t, {bkt} AS _b FROM (
        SELECT _id, _is_t, unnest(list_concat(_t,
          list_transform(range(1, len(_t)),
                         i -> _t[i] || ' ' || _t[i + 1]))) AS _g
        FROM _tk) q
    ), _ct AS (
      SELECT _b, CAST(count(*) AS BIGINT) AS ct FROM _gb
      WHERE _is_t GROUP BY 1
    ), _cs AS (
      SELECT _b, CAST(count(*) AS BIGINT) AS cs FROM _gb GROUP BY 1
    ), _tt AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM _ct),
    _ts AS (SELECT CAST(sum(cs) AS BIGINT) AS ts FROM _cs),
    _sc AS (
      SELECT COALESCE(_ct._b, _cs._b) AS _b,
             {_lp('COALESCE(ct, 0)', 'tt')} - {_lp('COALESCE(cs, 0)', 'ts')}
             AS s
      FROM _ct FULL JOIN _cs ON _ct._b = _cs._b
      CROSS JOIN _tt CROSS JOIN _ts
    ), _dn AS (
      SELECT _id, _b, CAST(count(*) AS BIGINT) AS nb FROM _gb GROUP BY 1, 2
    ), _dw AS (
      SELECT _id, CAST(sum(nb * s) AS BIGINT) AS lw
      FROM _dn JOIN _sc USING (_b) GROUP BY 1
    ), _w AS (
      SELECT t.{id_col} AS _id, COALESCE(lw, 0) AS logw_scaled
      FROM {table} t LEFT JOIN _dw ON t.{id_col} = _dw._id
    )
    SELECT _id AS {id_col}, logw_scaled,
           CAST(floor(-ln(-ln(({h48} + 1) / {_U48_DENOM!r})) * {sc})
                AS BIGINT) AS gumbel_scaled
    FROM _w
    ORDER BY logw_scaled
             + CAST(floor(-ln(-ln(({h48} + 1) / {_U48_DENOM!r})) * {sc})
                    AS BIGINT) DESC, _id
    LIMIT {n}
    """
