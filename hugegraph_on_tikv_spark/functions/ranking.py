"""Corpus ranking / retrieval for training-data and search pipelines.

``bm25_scores`` is *exactified* BM25: the classic formula's log-IDF is
replaced by the rational odds-ratio IDF ``(N - df + 0.5) / (df + 0.5)`` —
``ln`` is a libm call that differs between engines in the last ulp, while
``+ - * /`` on doubles are fully specified by IEEE 754, so the rational
form is bit-identical in Spark and DuckDB when the expression tree is
mirrored textually (both sides are generated from ``bm25_score_expr`` in
this module, so they cannot drift).  Per term the log is monotone, so
single-term rankings equal classic BM25; multi-term rankings weight rare
terms more steeply — a documented scoring contract, like
``text.lang_id``'s marker heuristic.

Scale shape (100 TB): per-term tf columns are per-row JVM lambda
expressions on ONE corpus scan — no explode, no token shuffle; corpus
stats (N, Σdl, per-term df) are a single map-side-combinable aggregate
reduced to one row and broadcast back via the established 1-row crossJoin
scalar pattern.  The only shuffle in the whole operator is the final
top-k rank cut.

``rrf_fuse`` implements reciprocal-rank fusion (Cormack et al., SIGIR'09):
``score(d) = Σ_lists 1 / (K + rank_list(d))`` — the standard way to blend
a keyword ranking with a vector ranking without score calibration.  Ranks
are small integers, so the two-term double sum is engine-portable.

Reference parity: the reference's search surface is the token index
(BaseIndexStore SEARCH splitting, see operators/indexes.search_index);
BM25/RRF extend it to scored retrieval, which Spark expresses natively.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

_TERM_RE = re.compile(r"[a-z0-9]+\Z")


def _check_terms(terms: list[str]) -> list[str]:
    terms = list(terms)
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    for t in terms:
        if not _TERM_RE.match(t):
            raise ValueError(f"query term must be lowercase alnum: {t!r}")
    if len(set(terms)) != len(terms):
        raise ValueError("duplicate query terms")
    return terms


def bm25_score_expr(terms: list[str], k1: float = 1.2, b: float = 0.75,
                    dl: str = "dl", n: str = "N", sumdl: str = "sumdl") -> str:
    """The BM25 score as a SQL expression string valid — and textually
    identical — in both Spark SQL and DuckDB.  Expects columns ``tf_i`` /
    ``df_i`` per term plus ``dl``, ``N``, ``sumdl``.  Every operand is
    explicitly CAST to DOUBLE and every operation parenthesized, so both
    engines evaluate the identical IEEE-754 expression tree.  Constants
    (k1+1, 1-b) are folded HERE in Python and embedded via repr(), so
    neither engine's constant folder participates.
    """
    k1p1 = repr(float(k1) + 1.0)
    one_minus_b = repr(1.0 - float(b))
    k1_r, b_r = repr(float(k1)), repr(float(b))
    parts = []
    for i, _ in enumerate(terms):
        tf = f"CAST(tf_{i} AS DOUBLE)"
        df = f"CAST(df_{i} AS DOUBLE)"
        idf = f"(((CAST({n} AS DOUBLE) - {df}) + 0.5) / ({df} + 0.5))"
        denom = (f"({tf} + ({k1_r} * ({one_minus_b} + ({b_r} * "
                 f"((CAST({dl} AS DOUBLE) * CAST({n} AS DOUBLE)) / "
                 f"CAST({sumdl} AS DOUBLE))))))")
        parts.append(f"(({idf} * ({tf} * {k1p1})) / {denom})")
    return " + ".join(parts)


def bm25_scores(docs: DataFrame, terms: list[str], k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document BM25 score for a literal term list.

    Returns (id_col, dl, score) for every document (score 0.0 when no
    term matches).  One scan + one scalar aggregate + one broadcast-back.
    """
    terms = _check_terms(terms)
    base = docs.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).withColumn("dl", F.size("_toks"))
    for i, t in enumerate(terms):
        base = base.withColumn(
            f"tf_{i}", F.expr(f"size(filter(_toks, x -> x = '{t}'))"))
    base = base.drop("_toks")
    stats = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").alias("sumdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    )
    scored = base.join(F.broadcast(stats))
    return scored.withColumn(
        "score", F.expr(bm25_score_expr(terms, k1, b))
    ).select(id_col, "dl", "score")


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k matching documents: score > 0, ranked by (score DESC, id ASC)
    — the deterministic tie-break every ranked operator here uses.  The
    cut is orderBy().limit(k), which compiles to TakeOrderedAndProject
    (per-partition partial top-k merged on the driver — no global-window
    single-partition shuffle of the corpus); ranks are then assigned by a
    window over only the k survivors."""
    scored = bm25_scores(docs, terms, k1, b, text_col, id_col)
    top = (scored.filter(F.col("score") > 0.0)
           .orderBy(F.col("score").desc(), F.col(id_col).asc())
           .limit(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def rrf_expr(rank_cols: list[str], k_rrf: int = 60) -> str:
    """Reciprocal-rank-fusion score over nullable integer rank columns —
    one textual expression shared by the Spark plan and the DuckDB oracle."""
    kd = repr(float(k_rrf))
    terms = [
        f"(CASE WHEN {c} IS NULL THEN 0.0 ELSE "
        f"(1.0 / ({kd} + CAST({c} AS DOUBLE))) END)"
        for c in rank_cols
    ]
    return " + ".join(terms)


def rrf_fuse(ranked_lists: list[DataFrame], id_col: str = "doc_id",
             k_rrf: int = 60, k: int | None = None) -> DataFrame:
    """Fuse N ranked lists — each (id_col, rank) — into one RRF ranking.

    Full-outer joins on the id (each list is already top-k-small, so these
    are broadcast-size at any corpus scale), scores with ``rrf_expr``, and
    re-ranks by (rrf_score DESC, id ASC).  Returns (id_col, rank_0..n,
    rrf_score, rank)."""
    if len(ranked_lists) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    out = None
    for i, r in enumerate(ranked_lists):
        cur = r.select(F.col(id_col), F.col("rank").alias(f"rank_{i}"))
        out = cur if out is None else out.join(cur, on=id_col, how="full_outer")
    out = out.withColumn(
        "rrf_score", F.expr(rrf_expr([f"rank_{i}" for i in range(len(ranked_lists))], k_rrf)))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    out = out.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out


def hybrid_search(docs: DataFrame, embeddings: DataFrame, terms: list[str],
                  query_vec: DataFrame, k: int = 10, per_list_k: int = 20,
                  k_rrf: int = 60, id_col: str = "doc_id",
                  vec_id_col: str = "vec_id") -> DataFrame:
    """Keyword (BM25) + vector (cosine) retrieval fused with RRF.

    ``query_vec`` is a 1-row DataFrame with the query embedding;
    embedding ids are assumed aligned with document ids (the usual
    doc-id-keyed embedding store).  Returns (doc_id, rank_0 [keyword],
    rank_1 [vector], rrf_score, rank) for the top ``k``."""
    from .similarity import cosine_topk

    kw = bm25_topk(docs, terms, k=per_list_k, id_col=id_col) \
        .select(F.col(id_col), "rank")
    vec = cosine_topk(query_vec, embeddings, k=per_list_k,
                      id_col=vec_id_col) \
        .select(F.col("neighbor_id").alias(id_col), "rank")
    return rrf_fuse([kw, vec], id_col=id_col, k_rrf=k_rrf, k=k)
