"""Probabilistic record linkage (Fellegi & Sunter 1969) — the classic
entity-resolution scorer, re-expressed Spark-first and EXACTIFIED.

Reference parity note: the reference engine has no linkage operators
(north-star surface, like dedup/similarity); this completes the
entity-resolution ladder next to fuzzy_pairs (edit-distance blocking)
and set_similarity_join (token-set blocking) with the classical
field-agreement probabilistic model.

Model: for candidate pair (a, b) and comparison fields f_1..f_k, the
classical match weight is Σ_i log2(m_i/u_i) over agreeing fields plus
Σ_i log2((1-m_i)/(1-u_i)) over disagreeing ones, where m_i = P(agree |
true match) (caller-supplied domain knowledge) and u_i = P(agree |
non-match) (estimated from data as the random-agreement probability).
log2 is libm — engine-divergent in the last ulp — so, exactly like
ranking.bm25_score_expr dropped log-IDF for the rational odds-ratio,
the weight here is the PRODUCT of likelihood ratios

    W(a, b) = Π_i  (m_i / u_i)           if field i agrees
              Π_i  ((1-m_i) / (1-u_i))   if it disagrees

— a strictly monotone transform of the log weight (same ranking, same
threshold semantics; thresholds are simply 2^(log-threshold)).  Every
factor is a double division of exact integers times a literal, combined
in FIXED field order — bit-identical across engines, which is what lets
the driver hash-check linkage output.

u_i estimation: u_i = Σ_v c_v² / N² over the right table's value
frequencies (the probability two random right-side records agree on the
field).  Σc² and N² are exact BIGINTs; the division is the single float
op.  The per-field scalars are collected driver-side (k scalars —
metadata-sized by contract) and embedded as plan literals.

Scale shape: candidates come from BLOCKING (equi-join on the block key),
never all-pairs; the u-statistics are one map-side-combinable aggregate
per run; scoring is a pure column expression over the candidate stream
(whole-stage codegen, no UDF, no shuffle beyond the block join).  Skewed
blocks are the caller's blocking-key choice — the standard mitigation
(compound keys) is exactly what the docstring of the driver fixture
shows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 0.9


def field_u_stats(right: DataFrame, fields: list[str]) -> dict[str, tuple[int, int]]:
    """Per-field (Σ count(v)², N²) over the right table — exact integers.
    NULL values are excluded from the frequency table (a NULL never
    'agrees' with anything in the scorer either)."""
    # r11: ONE collect for all statistics (previously 1 count + one
    # aggregation job PER field — k+1 driver round trips).  Each union
    # branch computes its own field's Σc² natively (no type coercion);
    # the row-count rides as one more branch.
    branches = [right.agg(F.lit("__n__").alias("f"),
                          F.count(F.lit(1)).cast("long").alias("s"))]
    for f in fields:
        branches.append(
            right.filter(F.col(f).isNotNull())
            .groupBy(f).agg(F.count(F.lit(1)).alias("c"))
            .agg(F.lit(f).alias("f"),
                 F.sum(F.col("c") * F.col("c")).cast("long").alias("s")))
    allb = branches[0]
    for b in branches[1:]:
        allb = allb.unionByName(b)
    rows = {r["f"]: r["s"] for r in allb.collect()}
    n = int(rows["__n__"] or 0)
    return {f: (int(rows.get(f) or 0), n * n) for f in fields}


def fs_score_pairs(pairs: DataFrame, fields: list[str],
                   u_stats: dict[str, tuple[int, int]],
                   m: dict[str, float] | float = DEFAULT_M,
                   left_prefix: str = "l_", right_prefix: str = "r_",
                   upper: float = 100.0, lower: float = 2.0) -> DataFrame:
    """Score candidate pairs carrying {left_prefix}{f} / {right_prefix}{f}
    columns: adds per-field agreement flags agr_{f} (1/0), the odds-ratio
    product `weight`, and `decision` ('match' ≥ upper, 'possible' ≥
    lower, else 'non_match').  A NULL on either side counts as
    disagreement (conservative).  Factor order = `fields` order —
    part of the determinism contract."""
    mm = {f: (m if isinstance(m, (int, float)) else m.get(f, DEFAULT_M))
          for f in fields}
    for f, v in mm.items():
        if not 0.0 < v < 1.0:
            raise ValueError(
                f"m probability for field {f} must be in (0, 1), got {v}")
    weight = F.lit(1.0)
    cols = []
    for f in fields:
        s, nn = u_stats[f]
        if not 0 < s < nn:
            raise ValueError(f"degenerate u-statistic for field {f}: {s}/{nn}")
        # literal computation order is frozen: (m * nn) / s, ((1-m) * nn) / (nn - s)
        agree_f = (mm[f] * nn) / s
        disagree_f = ((1.0 - mm[f]) * nn) / (nn - s)
        agr = (F.col(f"{left_prefix}{f}").isNotNull()
               & F.col(f"{right_prefix}{f}").isNotNull()
               & (F.col(f"{left_prefix}{f}") == F.col(f"{right_prefix}{f}")))
        cols.append(agr.cast("int").alias(f"agr_{f}"))
        weight = weight * F.when(agr, F.lit(agree_f)).otherwise(F.lit(disagree_f))
    decision = (F.when(F.col("weight") >= upper, "match")
                .when(F.col("weight") >= lower, "possible")
                .otherwise("non_match"))
    return (pairs.select("*", *cols, weight.alias("weight"))
            .withColumn("decision", decision))


def fs_link(left: DataFrame, right: DataFrame, block_on: list[str],
            fields: list[str], id_col: str = "id",
            m: dict[str, float] | float = DEFAULT_M,
            upper: float = 100.0, lower: float = 2.0) -> DataFrame:
    """End-to-end Fellegi-Sunter linkage: block (equi-join on `block_on`,
    both sides must agree on every block key), score all within-block
    pairs, classify.  Returns (l_id, r_id, agr_*, weight, decision) for
    pairs at or above `lower` (non-matches are the overwhelming bulk of
    any block join — emitting them defeats the blocking).

    Both inputs need `id_col`, the block keys, and the comparison
    fields.  u-statistics come from the RIGHT side (pick the larger /
    more representative table as right)."""
    u_stats = field_u_stats(right, fields)
    l = left.select(F.col(id_col).alias("l_id"), *block_on,
                    *[F.col(f).alias(f"l_{f}") for f in fields])
    r = right.select(F.col(id_col).alias("r_id"), *block_on,
                     *[F.col(f).alias(f"r_{f}") for f in fields])
    pairs = l.join(r, block_on).drop(*block_on)
    scored = fs_score_pairs(pairs, fields, u_stats, m=m,
                            upper=upper, lower=lower)
    return scored.filter(F.col("weight") >= lower)


def er_clusters(match_pairs: DataFrame, l_id: str = "l_id",
                r_id: str = "r_id", max_iterations: int = 10) -> DataFrame:
    """Entity-resolution clustering: connected components over the
    bipartite match graph, so transitive matches (L1-R1, L2-R1) collapse
    into ONE entity.  Node ids are namespaced 2*id (left) / 2*id+1
    (right) — the two tables' key spaces may collide; cluster_id = the
    minimum ENCODED node id in the component (deterministic).

    Returns (side 'L'|'R', rec_id, cluster_id) for every record that
    appears in at least one match pair.  Singletons are by definition
    their own entity and are not emitted — union them in with a
    left-anti join if a total clustering is needed.

    Scale shape: delegates to the HashMin component loop
    (operators/analytics.py) — one aggregate-messages shuffle per round;
    linkage components are short chains (diameter ≈ the number of
    transitively-linked duplicates), so rounds stay single-digit."""
    from ..operators.analytics import connected_components

    edges = match_pairs.select(
        (F.col(l_id).cast("long") * 2).alias("src"),
        (F.col(r_id).cast("long") * 2 + 1).alias("dst"))
    comp = connected_components(edges, max_iterations=max_iterations)
    return comp.select(
        F.when(F.col("id") % 2 == 0, F.lit("L")).otherwise(F.lit("R"))
        .alias("side"),
        F.expr("id DIV 2").cast("long").alias("rec_id"),
        F.col("component").cast("long").alias("cluster_id"))


def golden_records(clusters: DataFrame, left: DataFrame, right: DataFrame,
                   fields: list[str], id_col: str = "id") -> DataFrame:
    """Survivorship: one canonical record per resolved entity.  Per
    cluster and field, the most frequent non-NULL value wins; frequency
    ties break to the MINIMUM value — deterministic without negating ids
    (string-safe, the near_dedup tie-break lesson).  Returns
    (cluster_id, n_members, <fields...>); a field all-NULL across the
    cluster stays NULL.

    Scale shape: per-field (cluster, value) counts are map-side
    combinable aggregates; the winner is picked by a max-count join +
    min-value aggregate — no windows over member lists, so a celebrity
    entity with millions of duplicates never single-tasks a sort."""
    l = left.select(F.lit("L").alias("side"),
                    F.col(id_col).cast("long").alias("rec_id"), *fields)
    r = right.select(F.lit("R").alias("side"),
                     F.col(id_col).cast("long").alias("rec_id"), *fields)
    recs = l.unionByName(r).join(clusters, ["side", "rec_id"])
    out = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"))
    for f in fields:
        cnts = (recs.filter(F.col(f).isNotNull())
                .groupBy("cluster_id", f)
                .agg(F.count(F.lit(1)).alias("cnt")))
        best = cnts.groupBy("cluster_id").agg(F.max("cnt").alias("mc"))
        canon = (cnts.join(best, "cluster_id")
                 .filter(F.col("cnt") == F.col("mc"))
                 .groupBy("cluster_id").agg(F.min(f).alias(f)))
        out = out.join(canon, "cluster_id", "left")
    return out


def er_resolve(left: DataFrame, right: DataFrame, block_on: list[str],
               fields: list[str], id_col: str = "id",
               m: dict[str, float] | float = DEFAULT_M,
               upper: float = 100.0, lower: float = 2.0) -> DataFrame:
    """The full MDM pipeline: Fellegi-Sunter link -> component clusters
    over 'match' decisions -> golden-record survivorship.  Returns the
    golden_records frame."""
    pairs = fs_link(left, right, block_on, fields, id_col=id_col,
                    m=m, upper=upper, lower=lower)
    matches = pairs.filter(F.col("decision") == "match")
    clusters = er_clusters(matches)
    return golden_records(clusters, left, right, fields, id_col=id_col)
