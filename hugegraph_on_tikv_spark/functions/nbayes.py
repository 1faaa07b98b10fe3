"""Trainable Naive Bayes quality classifier — the GPT-3-style supervised
corpus-quality rung (Brown et al. 2020 trained a simple classifier on a
curated-positive vs raw-negative slice and kept high-scoring documents;
fastText's supervised mode is the same shape).  Complements the heuristic
(Gopher thresholds), statistical (CCNet df) and model-based (bigram-LM)
quality stages already in the pipeline.

Exact-rational formulation (the lm.py / BM25 / fslink precedent): under
add-k smoothing every per-token class likelihood is a ratio of counts,

    p(t | c) = (c_c(t) + k) / (N_c + k * V)

so the per-token positive/negative likelihood RATIO is

    r(t) = (c_pos(t) + k) * (N_neg + k * V)
           -----------------------------------
           (c_neg(t) + k) * (N_pos + k * V)

and instead of summing engine-divergent libm logs we expose

    score_scaled = SUM over tokens of  floor(r(t) * SCALE)

an order-independent exact-integer aggregate that hash-matches
bit-identically between Spark and DuckDB (products run in decimal(38,0) /
HUGEINT before the one integer division).  The float `log_odds` (true
Σ log r(t) + log prior odds) rides along for production thresholding but
is excluded from driver value-hash projections; a pytest pins it against
a pure-Python reference.  The driver-checkable decision rule is the
monotone mean-ratio cut  score_scaled >= n_tokens * SCALE  (mean
likelihood ratio >= 1), the same exact-integer stand-in style as
curate_v5's LM stage.

Scale shape (100 TB): the model is one V-sized token table.  Token
frequency is Zipfian, so `nb_score` reuses lm_score's two-path join: the
top-`head_size` tokens by training count BROADCAST (the skewed mass joins
map-side), and only the long tail — every key rarer than the head
threshold by construction — goes through the shuffle join, where AQE sees
a near-uniform key distribution.

Reference parity: the reference engine has no classifier — north-star
surface for the training-data pipeline (brief: quality scoring family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

SCALE = 1_000_000
_DEC = "decimal(38,0)"


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, t) per token occurrence — the unigram stream."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens(F.col(text_col))).alias("t"))
    )


def nb_train(labeled: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             label_col: str = "label") -> tuple[DataFrame, DataFrame]:
    """Train token log-odds from a labeled slice (label: 1 = positive /
    high-quality, 0 = negative).  Returns (token_stats(t, c_pos, c_neg),
    totals: 1-row (n_pos, n_neg, v, d_pos, d_neg)) — all exact BIGINT
    counts: per-class token-occurrence counts, class token totals, vocab
    size over BOTH classes, and class document counts (for the prior)."""
    stream = (
        labeled.select(F.col(id_col).alias("doc_id"),
                       F.col(label_col).cast("int").alias("y"),
                       F.explode(tokens(F.col(text_col))).alias("t"))
    )
    stats = stream.groupBy("t").agg(
        F.sum(F.col("y")).cast("long").alias("c_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("c_neg"))
    totals = (
        stream.agg(
            F.sum("y").cast("long").alias("n_pos"),
            F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
            F.count_distinct("t").alias("v"))
        .crossJoin(F.broadcast(labeled.agg(
            F.sum(F.col(label_col).cast("int")).cast("long").alias("d_pos"),
            F.sum(1 - F.col(label_col).cast("int")).cast("long")
            .alias("d_neg"))))
    )
    return stats, totals


def nb_score(df: DataFrame, labeled: DataFrame, add_k: int = 1,
             text_col: str = "text", id_col: str = "doc_id",
             label_col: str = "label",
             head_size: int = 10_000) -> DataFrame:
    """Score every document of `df` under the NB model trained on
    `labeled`.  Output per doc that tokenizes to >= 1 token:

      n_tokens      token occurrences scored
      score_scaled  Σ floor(r(t)·SCALE) — the exact-integer surrogate
      pred_mean     score_scaled >= n_tokens·SCALE (mean ratio >= 1) —
                    the driver-checkable decision
      log_odds      log prior odds + Σ log r(t), double (production rule
                    log_odds > 0; excluded from value hashes)

    Unseen tokens (not in the training vocab) still score via the
    smoothing floor r = (k·(N_neg+kV)) / (k·(N_pos+kV)) — the coalesce-0
    path, mirroring lm_score's UNK handling."""
    stats, totals = nb_train(labeled, text_col, id_col, label_col)
    stream = _doc_tokens(df, text_col, id_col)

    head = (stats.withColumn("c_tot", F.col("c_pos") + F.col("c_neg"))
            .orderBy(F.desc("c_tot"), F.asc("t")).limit(head_size)
            .drop("c_tot"))
    hit = stream.join(F.broadcast(head), "t", "left")
    matched = hit.filter(F.col("c_pos").isNotNull())
    tail = (hit.filter(F.col("c_pos").isNull()).drop("c_pos", "c_neg")
            .join(stats, "t", "left"))
    scored = matched.unionByName(tail).crossJoin(F.broadcast(totals))

    num = ((F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(add_k)).cast(_DEC)
           * (F.col("n_neg") + F.lit(add_k) * F.col("v")).cast(_DEC))
    den = ((F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(add_k)).cast(_DEC)
           * (F.col("n_pos") + F.lit(add_k) * F.col("v")).cast(_DEC))
    per_tok = scored.select(
        "doc_id",
        (num * F.lit(SCALE).cast(_DEC)).alias("rnum"),
        den.alias("rden"),
        F.log(num.cast("double") / den.cast("double")).alias("lr"),
        "d_pos", "d_neg",
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.expr("rnum DIV rden")).cast("long").alias("score_scaled"),
            (F.log(F.max("d_pos").cast("double"))
             - F.log(F.max("d_neg").cast("double"))
             + F.sum("lr")).alias("log_odds"),
        )
        .withColumn("pred_mean",
                    F.col("score_scaled")
                    >= F.col("n_tokens") * F.lit(SCALE))
    )


def nb_filter(df: DataFrame, labeled: DataFrame, add_k: int = 1,
              text_col: str = "text", id_col: str = "doc_id",
              label_col: str = "label") -> DataFrame:
    """The optional curate-v6 stage: keep documents the classifier calls
    positive under the exact-integer mean-ratio rule (docs that tokenize
    to nothing have no score and drop — curate_v5's LM-stage inner-join
    semantics)."""
    keep = (nb_score(df, labeled, add_k, text_col, id_col, label_col)
            .filter(F.col("pred_mean"))
            .select(F.col("doc_id").alias(id_col)))
    return df.join(keep, id_col)
