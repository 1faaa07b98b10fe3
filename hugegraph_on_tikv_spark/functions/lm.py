"""N-gram language-model quality scoring — the CCNet / Gopher-family
perplexity filter (Wenzek et al. 2020: train a small LM on a clean
reference corpus, score candidate documents, drop the worst tail).

Exact-rational formulation: every per-token probability under the add-k
bigram model is a ratio of two corpus counts,

    p(t | h) = (c(h,t) + k) / (c(h) + k * (V + 1))        (V+1: the UNK slot)

so instead of summing engine-divergent libm logs we expose

    sum_p_scaled = SUM over tokens of  (c(h,t)+k) * SCALE  DIV  (c(h)+k*(V+1))

an order-independent exact-integer aggregate (floor of each scaled ratio,
then integer sum) that hash-matches bit-identically between Spark and
DuckDB.  The float `sum_logp` / `ppl` columns (true log-likelihood and
perplexity) ride along for production filtering but are excluded from
driver value-hash projections; a pytest pins them against a Python
reference within 1e-9.

Overflow headroom: the scaled numerator is (c(h,t)+k) * SCALE with
SCALE = 1e6, so int64 holds up to ~9.2e12 occurrences of a single bigram
in the reference corpus — beyond a trillion-token training set.

Scale shape (100 TB): the history-count and vocabulary tables are V-sized
and broadcast; the bigram table joins the token stream on (h, t).  Hot
bigrams ("of the") make that key skewed, so `lm_score` splits the model
two-path: the top-`head_size` bigrams by count are BROADCAST (the skewed
mass joins map-side, no shuffle), and only the long tail — whose keys by
construction have count ≤ the head threshold — goes through the shuffle
join, where AQE sees a near-uniform key distribution.  A pytest pins
two-path == single-join equality.

Reference parity: the reference engine has no LM scorer — this is
north-star surface for the training-data pipeline (brief: text analysis /
quality scoring family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

BOS = "<s>"
SCALE = 1_000_000


def _token_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, h, t) per token occurrence — history = previous token,
    BOS for the first.  Pure codegen: transform-with-index over the token
    array (F.get is 0-based and NULL out-of-bounds), no window, no
    self-join."""
    arr = tokens(F.col(text_col))
    pairs = F.transform(
        arr,
        lambda t, i: F.struct(
            F.coalesce(F.get(arr, i - 1), F.lit(BOS)).alias("h"),
            t.alias("t"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.h").alias("h"), F.col("p.t").alias("t"))
    )


def lm_counts(ref: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram model on the reference corpus.  Returns
    (bigram_counts(h, t, c_ht), history_counts(h, c_h), vocab_size: 1-row
    DataFrame (v,)) — all exact BIGINT counts.  The BOS pseudo-token is a
    history only, never a predicted token, so V counts real tokens."""
    stream = _token_stream(ref, text_col, id_col)
    c_ht = stream.groupBy("h", "t").agg(F.count(F.lit(1)).cast("long").alias("c_ht"))
    # r11 (guide §2.3/§2.4): history counts and vocabulary size are exact
    # functions of the MODEL-sized bigram table — c(h) = Σ_t c(h,t) (every
    # token occurrence appears exactly once as (h, t)) and V = |{t}| (BOS
    # is a history only, so the t column's distinct set IS the vocabulary).
    # Deriving them from c_ht replaces two extra tokenize+explode passes
    # over the reference corpus with two bigram-table aggregations.
    c_ht = c_ht.localCheckpoint(eager=False)
    c_h = c_ht.groupBy("h").agg(F.sum("c_ht").cast("long").alias("c_h"))
    v = c_ht.select(F.count_distinct("t").alias("v"))
    return c_ht, c_h, v


def lm_score(df: DataFrame, ref: DataFrame | None = None, add_k: int = 1,
             text_col: str = "text", id_col: str = "doc_id",
             head_size: int = 10_000) -> DataFrame:
    """Score every document of `df` under a bigram LM trained on `ref`
    (default: df itself — self-scoring flags the corpus' own outliers).

    Output per doc: n_scored (token occurrences), sum_p_scaled (the exact
    integer aggregate — the driver-checkable quality signal, higher =
    more reference-like), sum_logp (true log-likelihood, double) and ppl
    (perplexity, double; excluded from value-hash projections).

    Two-path model join (see module docstring): head bigrams broadcast,
    tail shuffled — `head_size` bounds driver memory, the count ordering
    guarantees every shuffled key is rarer than every broadcast one."""
    if ref is None:
        ref = df
    c_ht, c_h, v = lm_counts(ref, text_col, id_col)
    stream = _token_stream(df, text_col, id_col)

    head = c_ht.orderBy(F.desc("c_ht"), F.asc("h"), F.asc("t")).limit(head_size)
    hit_head = stream.join(F.broadcast(head), ["h", "t"], "left")
    matched = hit_head.filter(F.col("c_ht").isNotNull())
    tail_side = hit_head.filter(F.col("c_ht").isNull()).drop("c_ht")
    # anti-join semantics via the NULL split keeps this one pass over the
    # stream; the tail join's keys all have c_ht below the head threshold
    tail = tail_side.join(c_ht, ["h", "t"], "left")
    scored = matched.unionByName(tail)

    scored = (
        scored.join(F.broadcast(c_h), "h", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.coalesce(F.col("c_ht"), F.lit(0)).alias("num0"),
            F.coalesce(F.col("c_h"), F.lit(0)).alias("den0"),
            "v",
        )
        .select(
            "doc_id",
            (F.col("num0") + F.lit(add_k)).alias("p_num"),
            (F.col("den0") + F.lit(add_k) * (F.col("v") + 1)).alias("p_den"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum(F.expr(f"(p_num * {SCALE}) DIV p_den")).cast("long")
            .alias("sum_p_scaled"),
            F.sum(F.log(F.col("p_num").cast("double") / F.col("p_den")))
            .alias("sum_logp"),
        )
        .withColumn("ppl", F.exp(-F.col("sum_logp") / F.col("n_scored")))
    )


def lm_score_tokens(df: DataFrame, ref: DataFrame | None = None,
                    add_k: int = 1, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Token-level probabilities (doc_id, h, t, p_num, p_den, p_scaled) —
    the audit view behind lm_score; single-join shape (no two-path split)
    since it exists for inspection, not the 100 TB hot path."""
    if ref is None:
        ref = df
    c_ht, c_h, v = lm_counts(ref, text_col, id_col)
    stream = _token_stream(df, text_col, id_col)
    return (
        stream.join(c_ht, ["h", "t"], "left")
        .join(F.broadcast(c_h), "h", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id", "h", "t",
            (F.coalesce(F.col("c_ht"), F.lit(0)) + F.lit(add_k)).alias("p_num"),
            (F.coalesce(F.col("c_h"), F.lit(0))
             + F.lit(add_k) * (F.col("v") + 1)).alias("p_den"),
        )
        .withColumn("p_scaled", F.expr(f"(p_num * {SCALE}) DIV p_den").cast("long"))
    )


def perplexity_filter(df: DataFrame, ref: DataFrame, max_ppl: float,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style keep rule: drop documents whose perplexity under the
    reference LM exceeds `max_ppl`.  Returns the surviving rows of `df`."""
    kept = (lm_score(df, ref, text_col=text_col, id_col=id_col)
            .filter(F.col("ppl") <= max_ppl)
            .select(F.col("doc_id").alias("__keep_id")))
    return df.join(kept, F.col(id_col) == F.col("__keep_id"), "left_semi")
