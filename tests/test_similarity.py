"""Vectorized/ANN similarity paths agree with the exact expression path."""

from __future__ import annotations

from hugegraph_on_tikv_spark.functions import similarity
from hugegraph_on_tikv_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_vectorized_equals_expression_topk(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = similarity.cosine_topk(queries, emb, k=5)
    vec = similarity.cosine_topk_vectorized(queries, emb, k=5)
    assert _pairs(vec) == _pairs(exact)
    # scores agree to rounding
    e = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()}
    v = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in vec.collect()}
    for key in e:
        assert abs(e[key] - v[key]) < 1e-5


def test_ivf_recall_against_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = _pairs(similarity.cosine_topk(queries, emb, k=5))
    approx = _pairs(similarity.ivf_topk(queries, emb, k=5, n_cells=8, n_probe=4))
    n_queries = queries.count()
    assert len(approx) == 5 * n_queries  # full result set per query
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3  # random uniform vectors: cells are weak but nontrivial
