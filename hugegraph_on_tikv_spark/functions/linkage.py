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
    n = right.count()
    out: dict[str, tuple[int, int]] = {}
    for f in fields:
        s = (right.filter(F.col(f).isNotNull())
             .groupBy(f).agg(F.count(F.lit(1)).alias("c"))
             .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
             .collect()[0]["s"]) or 0
        out[f] = (int(s), n * n)
    return out


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
