"""Text analysis for training-data pipelines (SURVEY.md §7 phase 4).

All pure built-in column expressions (JVM-side, whole-stage codegen) — no
Python UDFs in any hot path.  Every function has an exact DuckDB-SQL twin
for the correctness oracle, so heuristics (language-ID markers, quality
components) are deliberately closed-form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"
PUNCT_CLASS = "[.,!?;:'\"()\\[\\]{}-]"

# language → marker tokens.  Deterministic argmax heuristic: the language
# with the most DISTINCT markers present wins; ties break alphabetically;
# zero markers → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das"],
    "en": ["the", "a", "and", "of"],
    "es": ["el", "la", "los", "de"],
    "fr": ["le", "la", "les", "des"],
    "zh": ["的", "是", "了", "我"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """Lower-cased alphanumeric tokens."""
    return F.array_remove(F.split(F.lower(col), TOKEN_PATTERN), "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def normalized(col: Column) -> Column:
    """Canonical text form for fingerprints/shingles: lower, collapse all
    non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_PATTERN, " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text — stable under
    whitespace/punctuation/case noise."""
    return F.md5(normalized(col))


def lang_scores(col: Column) -> dict[str, Column]:
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Pick the first language (alphabetical) whose marker score equals the
    max; 'und' when no marker hits."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build CASE from last to first so the first max wins
    for lang in sorted(scores, reverse=True):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality components: token count, mean token length,
    punctuation ratio, stopword ratio — the standard cheap filters a 100 TB
    corpus pass runs before any model-based scoring."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(tok_chars / F.greatest(n_tok, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )


def phrase_match(col: Column, phrase: str) -> Column:
    """Exact token-sequence containment: the phrase (normalized at
    plan-build time) appears as consecutive tokens of the document.
    Space-padding both sides turns token-sequence containment into plain
    substring search on the normalized form — one JVM Contains over one
    scan, no token explode."""
    norm_phrase = " ".join(p for p in
                           __import__("re").split("[^a-z0-9]+", phrase.lower())
                           if p)
    if not norm_phrase:
        raise ValueError(f"phrase has no tokens: {phrase!r}")
    padded = F.concat(F.lit(" "), normalized(col), F.lit(" "))
    return padded.contains(f" {norm_phrase} ")


# PII redaction: the pattern set is deliberately closed-form (same RE2/Java
# common-subset regex both engines compile identically) and applied in a
# FIXED order — email, then SSN, then phone — because the phone pattern
# would otherwise swallow SSNs; counts are taken on the text as it stands
# at that step, mirroring the replacement order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "[PHONE]"),
]


def redact_pii(col: Column) -> Column:
    """The text with every PII match replaced by its placeholder."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts plus the md5 fingerprint of the
    redacted text (the column a scrubbed corpus would key dedup on).
    Pure column expressions — scales like a filter."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), *counts,
                     F.md5(redact_pii(F.coalesce(F.col(text_col), F.lit("")))
                           ).alias("redacted_fp"))


def corpus_top_ngrams(df: DataFrame, n: int = 2, k: int = 20,
                      text_col: str = "text") -> DataFrame:
    """Top-k most frequent word n-grams across the corpus — the quick
    boilerplate/catchphrase detector: (ngram, n_occurrences, rank) ranked
    by (count DESC, ngram ASC).  Explode + one map-side-combinable groupBy
    + a TakeOrderedAndProject cut; reuses dedup.word_shingles (multiset
    form — every occurrence counts)."""
    from .dedup import word_shingles

    grams = df.select(
        F.explode(word_shingles(F.coalesce(F.col(text_col), F.lit("")), n))
        .alias("ngram"))
    counts = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_occurrences"))
    from pyspark.sql import Window

    top = (counts.orderBy(F.col("n_occurrences").desc(),
                          F.col("ngram").asc()).limit(k))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
    return top.withColumn("rank", F.row_number().over(w))


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimator without a vocabulary: whitespace words
    are split at letter/digit boundaries, and each piece contributes
    ceil(len/4) tokens (the ~4-chars-per-token heuristic real BPE vocabs
    average on English text).  Closed-form and oracle-replicable; the
    standard cheap stand-in for budget accounting before a real tokenizer
    pass."""
    # maximal letter-runs and digit-runs (regexp_extract_all exists with the
    # same semantics in DuckDB; lookarounds would not — RE2)
    pieces = F.regexp_extract_all(F.lower(col), F.lit("[a-z]+|[0-9]+"), 0)
    return F.aggregate(
        pieces, F.lit(0), lambda acc, p: acc + F.ceil(F.length(p) / 4).cast("int")
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition filters — the Gopher/RefinedWeb quality
    rules that catch boilerplate and degenerate generations: a document
    whose tokens are mostly repeats of a few types (low distinct fraction,
    high top-token share) or whose bigrams loop (high duplicate-bigram
    fraction) is dropped before training.

    Returns (id, n_tokens, frac_distinct, top_token_frac, dup_bigram_frac).
    All three fractions are single divisions of exact integer counts, so
    the doubles are bit-identical across engines.

    Shape: the distinct/bigram counts are per-row ARRAY expressions (whole-
    stage codegen, no shuffle); only the top-token mode needs an explode +
    two-level aggregation — one shuffle keyed by doc id, map-side combined.
    At 100 TB every stage scales with the corpus and nothing is all-pairs."""
    t = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col).alias("id"), t.alias("_t"))
        .withColumn("_n", F.size("_t"))
        .withColumn("_nd", F.size(F.array_distinct("_t")))
        .withColumn(
            "_ndb",
            F.when(F.col("_n") < 2, F.lit(0)).otherwise(F.size(F.array_distinct(
                F.expr("transform(slice(_t, 1, size(_t) - 1), "
                       "(x, i) -> concat(x, ' ', element_at(_t, i + 2)))")))),
        )
    )
    top = (
        base.select("id", F.explode("_t").alias("_tok"))
        .groupBy("id", "_tok").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("id").agg(F.max("_c").alias("_topc"))
    )
    zero = F.lit(0.0)
    return (
        base.join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("_n").alias("n_tokens"),
            F.when(F.col("_n") == 0, zero)
            .otherwise(F.col("_nd") / F.col("_n")).alias("frac_distinct"),
            F.when(F.col("_n") == 0, zero)
            .otherwise(F.coalesce("_topc", F.lit(0)) / F.col("_n"))
            .alias("top_token_frac"),
            F.when(F.col("_n") < 2, zero)
            .otherwise(1.0 - F.col("_ndb") / (F.col("_n") - 1))
            .alias("dup_bigram_frac"),
        )
    )


def corpus_df_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style frequency scoring, exactified: per document, the mean
    corpus document-frequency of its DISTINCT tokens — high values mean
    the doc is built from corpus-ubiquitous vocabulary (boilerplate),
    low values mean rare/noisy vocabulary.  The float-log perplexity this
    stands in for is engine-UNportable (libm ln differs in the last ulp);
    summing integer document frequencies and dividing once keeps the
    score bit-identical everywhere, which is what lets the driver check
    it.

    Two aggregations: df(token) over (doc, token) distincts, then a
    per-doc integer sum — both map-side combinable, nothing all-pairs.
    Returns (id, n_distinct_tokens, sum_df, mean_df)."""
    toks = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_distinct_tokens"),
             F.sum("df").alias("sum_df"))
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_distinct_tokens",
        "sum_df",
        (F.col("sum_df") / F.col("n_distinct_tokens")).alias("mean_df"),
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-length normalization step of pretraining / RAG pipelines:
    chunk i covers tokens [i·stride, i·stride + chunk_tokens) of the
    normalized token stream, stride = chunk_tokens − overlap, and the last
    chunk starts at the final stride boundary that still begins inside the
    document (so short tails are kept, whole-doc when under one chunk).

    Pure JVM column algebra: tokenize once, `sequence` over chunk starts,
    explode, `slice` + `array_join` — no UDF, fully codegen'd, and every
    expression has an exact DuckDB mirror (list slicing), so chunk
    boundaries are engine-portable.  One row per (doc, chunk):
    (id_col, chunk_id, n_tokens, chunk_text).  Empty documents produce no
    rows.  At scale the explode multiplies rows by ~n_tokens/stride; chunk
    assembly stays within the row, so nothing shuffles until the caller
    aggregates."""
    if chunk_tokens < 1 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens >= 1 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    n = F.size(F.col("_toks"))
    # chunk starts: 0, stride, 2·stride, …, last multiple of stride < n
    starts = F.sequence(
        F.lit(0),
        F.floor((n - F.lit(1)) / F.lit(stride)).cast("int") * F.lit(stride),
        F.lit(stride))
    return (df
            # explicit IsNotNull pushes to the scan (the size() expression
            # filter below never can); NULL text yields no chunks either way
            .filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
            .filter(F.size("_toks") > 0)
            .select(id_col,
                    F.posexplode(starts).alias("chunk_id", "_start"),
                    F.col("_toks"))
            .select(
                id_col, "chunk_id",
                F.slice(F.col("_toks"), F.col("_start") + 1,
                        F.lit(chunk_tokens)).alias("_chunk"))
            .select(
                id_col, "chunk_id", F.size("_chunk").alias("n_tokens"),
                F.array_join("_chunk", " ").alias("chunk_text")))


def oov_stats(df: DataFrame, vocab_size: int = 1000, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Out-of-vocabulary scoring against the corpus' OWN top-`vocab_size`
    token vocabulary — the Gopher/CCNet-family quality signal
    ("fraction of tokens outside the head vocabulary"), occurrence-
    weighted where corpus_df_stats is distinct-token-weighted.

    Per document: n_tokens, n_oov (occurrences outside the vocabulary),
    oov_rate (ONE double division of two exact integers — bit-identical
    across engines), and sum_vocab_cf (summed corpus collection-frequency
    of the doc's in-vocab occurrences — the exact-integer stand-in for a
    unigram-LM log-likelihood, whose libm log is engine-divergent).

    Scale shape: the vocabulary is a TakeOrdered top-V cut (deterministic
    count-desc, token-asc tie-break) and is BROADCAST — the per-occurrence
    token stream joins map-side and never shuffles on the token key, so
    the 'the'-sized hot keys that would skew a repartition join never
    leave their input partitions.  Docs with zero tokens have no
    occurrences and are absent from the output (mirrored by the oracle)."""
    tok = df.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(F.col(text_col))).alias("token"))
    vocab = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size))
    joined = tok.join(F.broadcast(vocab), "token", "left")
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0))
                 .alias("n_oov"),
                 F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("sum_vocab_cf"))
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_oov").cast("long").alias("n_oov"),
                    (F.col("n_oov").cast("double") / F.col("n_tokens"))
                    .alias("oov_rate"),
                    F.col("sum_vocab_cf").cast("long").alias("sum_vocab_cf")))


def collocations(df: DataFrame, min_count: int = 5, k: int = 20,
                 text_col: str = "text") -> DataFrame:
    """Top-k collocations (adjacent token pairs that co-occur far more
    than their unigram frequencies predict) — PMI-ranked, EXACTIFIED.

    PMI = log(N·c_xy / (c_x·c_y)) is libm; since log is monotone, ranking
    by the rational lift N·c_xy / (c_x·c_y) is identical — so the order
    key is the exact-integer pair (c_xy·N, c_x·c_y) compared by cross
    multiplication, materialized here as lift_num/lift_den BIGINTs plus
    one float division `lift` for display.  N = total token occurrences.

    Ordering: lift DESC (via lift_num·other_den cross-compare encoded as
    the float — ties are then broken exactly), c_xy DESC, pair ASC; the
    emitted rank is recomputed from the exact integers so two engines
    cannot disagree on boundary ties.

    Scale shape: bigram + unigram counts are map-side-combinable
    aggregates; unigram counts broadcast back onto the (far smaller
    post-min_count) bigram table; the top-k cut is TakeOrdered."""
    from pyspark.sql import Window

    # r11 (guide §2.3/§2.4): ONE tokenization pass + ONE token-scale
    # shuffle.  Every token occurrence is emitted exactly once as
    # (w1 = token, w2 = next token or NULL for the document-final token),
    # so the (w1, w2) count table simultaneously yields
    #   bigram counts  = rows with w2 IS NOT NULL      (as before)
    #   unigram counts = Σ over w2 of cnt per w1        (exact)
    #   N              = Σ cnt                          (exact)
    # — previously `uni` and `n_total` each re-tokenized the corpus
    # (three token-scale passes, two token-scale shuffles).
    pairs = df.select(F.explode(F.expr(
        "transform({0}, (x, i) -> struct(x AS w1, get({0}, i+1) AS w2))".format(
            f"array_remove(split(lower({text_col}), '[^a-z0-9]+'), '')"))
    ).alias("p")).select("p.w1", "p.w2")
    cell = (pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=False))
    uni = (cell.groupBy("w1").agg(F.sum("cnt").alias("c"))
           .withColumnRenamed("w1", "t"))
    n_total = cell.agg(F.sum("cnt").cast("long").alias("n"))
    big = (cell.filter(F.col("w2").isNotNull())
           .select("w1", "w2", F.col("cnt").alias("c_xy"))
           .filter(F.col("c_xy") >= min_count))
    scored = (big
              .join(F.broadcast(uni.withColumnRenamed("t", "w1")
                                .withColumnRenamed("c", "c_x")), "w1")
              .join(F.broadcast(uni.withColumnRenamed("t", "w2")
                                .withColumnRenamed("c", "c_y")), "w2")
              .crossJoin(F.broadcast(n_total))
              .select("w1", "w2",
                      F.col("c_xy").cast("long").alias("c_xy"),
                      F.col("c_x").cast("long").alias("c_x"),
                      F.col("c_y").cast("long").alias("c_y"),
                      (F.col("c_xy") * F.col("n")).cast("long")
                      .alias("lift_num"),
                      (F.col("c_x") * F.col("c_y")).cast("long")
                      .alias("lift_den")))
    # exact ORDER key: lift compared by cross multiplication needs a total
    # order; num/den are coprime-free but num*1e6 DIV den is a stable
    # integer surrogate with ties then broken by the raw pair
    key = F.expr("(lift_num * 1000000) DIV lift_den")
    top = (scored.withColumn("lift_scaled", key.cast("long"))
           .orderBy(F.desc("lift_scaled"), F.desc("c_xy"),
                    F.asc("w1"), F.asc("w2"))
           .limit(k))
    w = Window.orderBy(F.desc("lift_scaled"), F.desc("c_xy"),
                       F.asc("w1"), F.asc("w2"))
    return (top.withColumn("rank", F.row_number().over(w))
            .withColumn("lift",
                        F.col("lift_num").cast("double") / F.col("lift_den"))
            .select("rank", "w1", "w2", "c_xy", "c_x", "c_y",
                    "lift_scaled", "lift"))
