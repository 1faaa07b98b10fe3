"""Scored retrieval (functions/ranking.py): BM25 known values, tie-break
determinism, RRF fusion semantics, and the plan contract (no corpus-wide
single-partition window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions import ranking


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark join spark filter"),
            (2, "spark scan"),
            (3, "merge sort window"),
            (4, "spark spark spark spark"),
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_bm25_known_values(corpus):
    out = {r["doc_id"]: r for r in
           ranking.bm25_scores(corpus, ["spark"], k1=1.2, b=0.75).collect()}
    # df(spark) = 3 of N=6 docs; avgdl = 13/6
    n, df = 6.0, 3.0
    idf = (n - df + 0.5) / (df + 0.5)
    for doc, tf, dl in [(1, 2, 4), (2, 1, 2), (4, 4, 4)]:
        denom = tf + 1.2 * (1 - 0.75 + 0.75 * (dl * n / 13.0))
        assert out[doc]["score"] == pytest.approx(idf * tf * 2.2 / denom)
    for doc in (3, 5, 6):
        assert out[doc]["score"] == 0.0
    # saturation: tf=4 in dl=4 beats tf=2 in dl=4, monotone but < 2x
    assert out[4]["score"] > out[1]["score"] > out[2]["score"]
    assert out[4]["score"] < 2 * out[1]["score"]


def test_bm25_topk_cut_and_ties(spark):
    # identical docs score identically -> tie broken by ascending doc_id
    docs = spark.createDataFrame(
        [(i, "spark scan") for i in range(10)] + [(99, "other words")],
        "doc_id long, text string",
    )
    top = ranking.bm25_topk(docs, ["spark"], k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2]
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_bm25_topk_plan_has_no_global_corpus_window(corpus):
    # the corpus cut must be TakeOrderedAndProject, not a row_number over
    # an unpartitioned corpus-wide window
    plan = ranking.bm25_topk(corpus, ["spark"], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_bad_terms(corpus):
    for bad in (["Spark"], ["sp ark"], ["spark'"], [], ["a", "a"]):
        with pytest.raises(ValueError):
            ranking.bm25_scores(corpus, bad)


def test_rrf_fuse_known_values(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in
           ranking.rrf_fuse([a, b], k_rrf=60).collect()}
    assert out[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[1]["rrf_score"] == pytest.approx(1 / 61)
    assert out[3]["rrf_score"] == pytest.approx(1 / 62)
    # doc in both lists outranks single-list docs
    assert out[2]["rank"] == 1
    # 1/61 > 1/62: list-a's #1 beats list-b's #2
    assert out[1]["rank"] == 2 and out[3]["rank"] == 3


def test_rrf_fuse_k_cut_and_tiebreak(spark):
    a = spark.createDataFrame([(7, 1), (5, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(9, 1), (6, 2)], "doc_id long, rank int")
    out = ranking.rrf_fuse([a, b], k=2).orderBy("rank").collect()
    # 7 and 9 tie at 1/61 -> doc_id ascending breaks it
    assert [r["doc_id"] for r in out] == [7, 9]


def test_hybrid_search_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, "spark scan" if i < 3 else "merge sort") for i in range(6)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = ranking.hybrid_search(
        docs, emb, ["spark"], emb.filter(F.col("vec_id") == 5),
        k=4, per_list_k=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    # keyword hits carry rank_0, vector hits rank_1; doc in either appears
    assert rows and all(r["rrf_score"] > 0 for r in rows.values())
    kw_only = [d for d, r in rows.items() if r["rank_1"] is None]
    assert set(kw_only) <= {0, 1, 2}
