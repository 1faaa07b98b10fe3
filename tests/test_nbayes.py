"""Naive Bayes quality classifier vs a pure-Python reference."""
from __future__ import annotations

import math
import re

import pytest

from hugegraph_on_tikv_spark.functions import nbayes

DOCS = [
    (1, "good clean prose with many useful words", 1),
    (2, "another fine document about spark and data", 1),
    (3, "buy cheap buy now click here click", 0),
    (4, "spam spam cheap cheap click", 0),
    (5, "useful words about data processing", 1),
    (6, "click here now cheap spam offer", 0),
]
SCORE_DOCS = [
    (10, "clean useful words about spark"),
    (11, "cheap spam click here"),
    (12, "data processing with many words"),
    (13, "zzz unseen tokens only qqq"),
]


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _reference(labeled, docs, k=1):
    c_pos: dict = {}
    c_neg: dict = {}
    n_pos = n_neg = d_pos = d_neg = 0
    vocab = set()
    for _, text, y in labeled:
        toks = _tok(text)
        if y:
            d_pos += 1
        else:
            d_neg += 1
        for t in toks:
            vocab.add(t)
            if y:
                c_pos[t] = c_pos.get(t, 0) + 1
                n_pos += 1
            else:
                c_neg[t] = c_neg.get(t, 0) + 1
                n_neg += 1
    v = len(vocab)
    out = {}
    for doc_id, text in docs:
        toks = _tok(text)
        if not toks:
            continue
        score = 0
        lo = math.log(d_pos) - math.log(d_neg)
        for t in toks:
            num = (c_pos.get(t, 0) + k) * (n_neg + k * v)
            den = (c_neg.get(t, 0) + k) * (n_pos + k * v)
            score += (num * nbayes.SCALE) // den
            lo += math.log(num / den)
        out[doc_id] = (len(toks), score, lo)
    return out


def test_nb_score_matches_pure_python(spark):
    labeled = spark.createDataFrame(DOCS, "doc_id long, text string, label int")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nbayes.nb_score(docs, labeled).collect()}
    want = _reference(DOCS, SCORE_DOCS)
    assert set(got) == set(want)
    for doc_id, (n, score, lo) in want.items():
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["score_scaled"] == score
        assert r["log_odds"] == pytest.approx(lo, abs=1e-9)
        assert r["pred_mean"] == (score >= n * nbayes.SCALE)
    # sanity: positive-looking docs score above negative-looking ones
    assert got[10]["score_scaled"] / got[10]["n_tokens"] > \
        got[11]["score_scaled"] / got[11]["n_tokens"]


def test_nb_two_path_equals_single_join(spark):
    labeled = spark.createDataFrame(DOCS, "doc_id long, text string, label int")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    full = nbayes.nb_score(docs, labeled, head_size=10_000)
    tiny_head = nbayes.nb_score(docs, labeled, head_size=2)
    a = sorted((r["doc_id"], r["n_tokens"], r["score_scaled"])
               for r in full.collect())
    b = sorted((r["doc_id"], r["n_tokens"], r["score_scaled"])
               for r in tiny_head.collect())
    assert a == b


def test_nb_filter_curate_stage(spark):
    labeled = spark.createDataFrame(DOCS, "doc_id long, text string, label int")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    kept = sorted(r["doc_id"]
                  for r in nbayes.nb_filter(docs, labeled).collect())
    want = _reference(DOCS, SCORE_DOCS)
    expect = sorted(d for d, (n, s, _) in want.items()
                    if s >= n * nbayes.SCALE)
    assert kept == expect
    # the spam-shaped doc must not survive
    assert 11 not in kept
