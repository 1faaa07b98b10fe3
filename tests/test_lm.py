"""Bigram-LM quality scoring (functions/lm.py) — the CCNet-style
perplexity filter.  Exact-integer aggregates are driver-oracled; here we
pin the float companions against a pure-Python reference, the two-path
(head-broadcast / tail-shuffle) model join against the single-join shape,
and the filter's keep semantics."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from hugegraph_on_tikv_spark.functions import lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat and the dog sat"),
    (3, "a cat a dog a mat"),
    (4, "zzz qqq xxx yyy zzz qqq"),  # out-of-domain junk
    (5, "the the the the the the"),  # degenerate repetition
]


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_reference(ref_rows, score_rows, add_k=1):
    """Plain-Python bigram add-k model: returns {doc_id: (n, sum_scaled,
    sum_logp)}."""
    c_ht: Counter = Counter()
    c_h: Counter = Counter()
    vocab = set()
    for _, text in ref_rows:
        toks = _tok(text)
        hist = ["<s>"] + toks[:-1]
        for h, t in zip(hist, toks):
            c_ht[(h, t)] += 1
            c_h[h] += 1
            vocab.add(t)
    v = len(vocab)
    out = {}
    for doc_id, text in score_rows:
        toks = _tok(text)
        hist = ["<s>"] + toks[:-1]
        n, s_scaled, s_logp = 0, 0, 0.0
        for h, t in zip(hist, toks):
            num = c_ht.get((h, t), 0) + add_k
            den = c_h.get(h, 0) + add_k * (v + 1)
            n += 1
            s_scaled += (num * lm.SCALE) // den
            s_logp += math.log(num / den)
        out[doc_id] = (n, s_scaled, s_logp)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_self_scored_matches_python_reference(spark, docs_df):
    got = {r.doc_id: r for r in lm.lm_score(docs_df).collect()}
    want = _py_reference(DOCS, DOCS)
    assert set(got) == set(want)
    for doc_id, (n, s_scaled, s_logp) in want.items():
        r = got[doc_id]
        assert r.n_scored == n
        assert r.sum_p_scaled == s_scaled
        assert r.sum_logp == pytest.approx(s_logp, abs=1e-9)
        assert r.ppl == pytest.approx(math.exp(-s_logp / n), rel=1e-12)


def test_reference_corpus_scoring_ranks_junk_last(spark, docs_df):
    ref = docs_df.filter("doc_id <= 3")
    scored = lm.lm_score(docs_df, ref).collect()
    ppl = {r.doc_id: r.ppl for r in scored}
    # both junk docs score worse than every in-domain doc.  (Doc 5 beats
    # doc 4 for worst overall: an unseen bigram after a COMMON history
    # gets p = k/(c(h)+k(V+1)), smaller than the fully-OOV uniform
    # k/(k(V+1)) — the add-k model penalises broken collocations harder
    # than unknown words.)
    clean_worst = max(ppl[d] for d in (0, 1, 2, 3))
    assert ppl[4] > clean_worst and ppl[5] > clean_worst
    want = _py_reference(DOCS[:4], DOCS)
    for r in scored:
        assert (r.n_scored, r.sum_p_scaled) == want[r.doc_id][:2]


def test_two_path_join_equals_single_join(spark, docs_df):
    """head_size=2 forces almost every bigram through the tail shuffle
    path; results must be identical to the all-broadcast head_size=10^4."""
    a = {r.doc_id: (r.n_scored, r.sum_p_scaled)
         for r in lm.lm_score(docs_df, head_size=2).collect()}
    b = {r.doc_id: (r.n_scored, r.sum_p_scaled)
         for r in lm.lm_score(docs_df, head_size=10_000).collect()}
    assert a == b


def test_token_level_probabilities_sum_to_doc_score(spark, docs_df):
    tok = lm.lm_score_tokens(docs_df).groupBy("doc_id").agg(
        {"p_scaled": "sum", "*": "count"}).collect()
    doc = {r.doc_id: r for r in lm.lm_score(docs_df).collect()}
    for r in tok:
        assert r["sum(p_scaled)"] == doc[r.doc_id].sum_p_scaled
        assert r["count(1)"] == doc[r.doc_id].n_scored


def test_probabilities_are_valid_and_sum_below_one(spark, docs_df):
    """Add-k mass check: for any seen history, the model's probabilities
    over observed next-tokens stay below 1 (the rest is UNK mass)."""
    rows = lm.lm_score_tokens(docs_df).collect()
    assert all(0 < r.p_num < r.p_den for r in rows)


def test_perplexity_filter_keeps_clean_docs(spark, docs_df):
    ref = docs_df.filter("doc_id <= 3")
    ppl = {r.doc_id: r.ppl for r in lm.lm_score(docs_df, ref).collect()}
    cut = sorted(ppl.values())[-2]  # drop only the worst doc
    kept = lm.perplexity_filter(docs_df, ref, max_ppl=cut - 1e-9)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    worst = max(ppl, key=ppl.get)
    assert worst not in kept_ids
    assert kept_ids == set(ppl) - {d for d, p in ppl.items() if p >= cut - 1e-9}


def test_empty_documents_absent_from_output(spark):
    df = spark.createDataFrame([(0, "a b"), (1, ""), (2, "...")],
                               ["doc_id", "text"])
    ids = {r.doc_id for r in lm.lm_score(df).collect()}
    assert ids == {0}
