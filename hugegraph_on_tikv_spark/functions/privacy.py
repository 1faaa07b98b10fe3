"""Privacy audits for training-data release: k-anonymity, l-diversity,
and suppression — the compliance checks a corpus pipeline runs before
publishing data carrying quasi-identifiers (Sweeney 2002; Machanavajjhala
et al. 2007).

All exact integer aggregates (group sizes, distinct counts) — no
estimation, no floats — so every report is driver-oracle-checkable.

Reference parity: the reference engine has no privacy operators
(north-star pipeline surface, like dedup/PII-scrub in functions/text.py —
redact_pii removes direct identifiers; these audits measure the residual
re-identification risk from quasi-identifier combinations).

Scale shape: one map-side-combinable groupBy per report over the
quasi-identifier key; suppression is a broadcast-or-shuffle semi-join of
the violating-group key set (by construction small — the point of the
report is that few groups violate).  No windows, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int) -> DataFrame:
    """Groups of quasi-identifier values with FEWER than `k` rows — each
    is a re-identification risk (an attacker knowing the quasi values
    pins the subject to < k candidates).  Returns (quasi..., n_rows),
    empty when the table is k-anonymous.  NULL quasi values form their
    own group (a NULL combination is as linkable as any other)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .filter(F.col("n_rows") < k))


def anonymity_level(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """The table's actual k: 1 row (k_level, n_groups, n_rows_at_risk)
    where k_level = the smallest quasi-group size and n_rows_at_risk =
    rows in groups of that minimal size."""
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    mn = sizes.agg(F.min("n").alias("k_level"))      # 1-row scalar broadcast
    return (sizes.crossJoin(F.broadcast(mn))
            .agg(F.min("k_level").cast("long").alias("k_level"),
                 F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum(F.when(F.col("n") == F.col("k_level"), F.col("n"))
                       .otherwise(0)).cast("long").alias("n_rows_at_risk")))


def l_diversity_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str, l: int) -> DataFrame:
    """Quasi-groups whose sensitive attribute takes FEWER than `l`
    distinct values — k-anonymity alone fails when everyone in the group
    shares the sensitive value (homogeneity attack).  Returns
    (quasi..., n_rows, n_distinct_sensitive) for violating groups.  NULL
    sensitive values do not count toward diversity."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.count_distinct(F.col(sensitive_col)).cast("long")
                 .alias("n_distinct_sensitive"))
            .filter(F.col("n_distinct_sensitive") < l))


def suppress_to_k(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Enforce k-anonymity by SUPPRESSION: drop every row in a
    quasi-group smaller than k (the standard last-resort step after
    generalization; callers generalize first — e.g. bin a zip code —
    then suppress the residue).  Returns the surviving rows."""
    bad = k_anonymity_report(df, quasi_cols, k).select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi_cols])
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__q_{c}"))   # NULL groups suppress too
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(bad), on=cond, how="left_anti")


def t_closeness_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str) -> DataFrame:
    """Per-quasi-group t-closeness for a CATEGORICAL sensitive attribute
    (Li, Li & Venkatasubramanian 2007): the total variation distance
    between the group's sensitive-value distribution and the table-wide
    one — l-diversity's fix for skewness attacks (a group can be diverse
    yet still leak when its mix differs wildly from the population).

    Exact rational form (the corr_pairs/modularity precedent — never a
    float sum of floats):

        tvd = 1/2 Σ_s |n_gs/n_g − N_s/N| = Σ_s |n_gs·N − N_s·n_g| / (2·n_g·N)

    Numerator terms are decimal(38,0) products of exact counts, summed
    before any division; ONE final double division produces `tvd`.  The
    exact pair also returns as strings (tvd_num, tvd_den) so callers can
    hash-check past double precision.

    NULL sensitive values are excluded from both distributions (the
    l_diversity_report contract).  The candidate (group × value) grid is a
    join against the distinct sensitive-value table — bounded by the
    sensitive domain, which is small by the problem's construction (a
    10^6-value "sensitive attribute" is an identifier, not a category).

    Returns (quasi..., n_rows, tvd_num, tvd_den, tvd), one row per
    quasi-group, tvd in [0, 1]."""
    base = df.filter(F.col(sensitive_col).isNotNull())
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    glob = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("n_s"))
    totals = glob.agg(F.sum("n_s").cast("long").alias("n_total"))
    groups = base.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n_g"))
    cells = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("n_gs"))
    grid = (
        groups.join(F.broadcast(glob))                 # bounded: |groups|·|domain|
        .join(F.broadcast(totals))
        .join(cells, [*quasi_cols, sensitive_col], "left")
        .withColumn("n_gs", F.coalesce("n_gs", F.lit(0)))
    )
    term = F.abs(dec("n_gs") * dec("n_total") - dec("n_s") * dec("n_g"))
    return (
        grid.groupBy(*quasi_cols)
        .agg(F.min("n_g").cast("long").alias("n_rows"),
             F.sum(term).alias("num"),
             (F.lit(2).cast("decimal(19,0)") * F.min(dec("n_g"))
              * F.min(dec("n_total"))).alias("den"))
        .select(*quasi_cols, "n_rows",
                F.col("num").cast("string").alias("tvd_num"),
                F.col("den").cast("string").alias("tvd_den"),
                (F.col("num").cast("double")
                 / F.col("den").cast("double")).alias("tvd"))
    )
