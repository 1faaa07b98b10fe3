"""Property-based tests (hypothesis): the contract-heavy surfaces where
enumerating cases by hand misses the weird corners — paging cursors, range
bound inclusivity, lexicographic resume predicates, and salting — checked
against simple Python reference models."""

from __future__ import annotations

import datetime as dt
import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hugegraph_on_tikv_spark.plans.engine import QueryEngine, decode_page, encode_page
from hugegraph_on_tikv_spark.plans.ir import IdRangeQuery

# -- paging cursor round-trip (pure python, fast) ---------------------------

_key_value = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.datetimes(min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)),
    st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
    st.decimals(allow_nan=False, allow_infinity=False, places=6),
)


@given(st.lists(_key_value, min_size=1, max_size=4))
def test_page_cursor_round_trips_typed(values):
    assert decode_page(encode_page(values)) == values


# -- range-scan inclusivity vs a python model (small Spark frames) ----------

_bound = st.one_of(st.none(), st.integers(min_value=-5, max_value=25))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(start=_bound, end=_bound, inc_s=st.booleans(), inc_e=st.booleans())
def test_range_scan_matches_model(spark, range_df, start, end, inc_s, inc_e):
    got = sorted(
        r["k"] for r in QueryEngine(range_df, key="k").query(
            IdRangeQuery(table="t", start=start, end=end,
                         inclusive_start=inc_s, inclusive_end=inc_e)
        ).collect()
    )
    def keep(k):
        if start is not None and not (k >= start if inc_s else k > start):
            return False
        if end is not None and not (k <= end if inc_e else k < end):
            return False
        return True
    assert got == [k for k in range(20) if keep(k)]


# -- lexicographic keyset-resume predicate vs sorted-list model -------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cursor=st.tuples(st.integers(min_value=-1, max_value=4),
                        st.integers(min_value=-1, max_value=4)))
def test_composite_keyset_resume_matches_model(spark, pair_df, cursor):
    from hugegraph_on_tikv_spark.plans.engine import _after_cursor

    got = sorted(
        (r["a"], r["b"]) for r in pair_df.filter(
            _after_cursor(["a", "b"], list(cursor))).collect()
    )
    want = sorted((a, b) for a in range(4) for b in range(4)
                  if (a, b) > cursor)
    assert got == want


import pytest


@pytest.fixture(scope="module")
def range_df(spark):
    return spark.createDataFrame([(k,) for k in range(20)], "k int").cache()


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], "a int, b int").cache()


# -- as-of join vs DuckDB's native ASOF JOIN on random data -----------------

# time may be NULL on either side: DuckDB's ASOF (l.t >= r.t) never
# matches a NULL time, so a NULL-time right row must never be carried
# forward as "the" as-of row and a NULL-time left row must be dropped.
_time = st.one_of(st.none(), st.integers(min_value=0, max_value=30))
_pair = st.tuples(st.integers(min_value=0, max_value=3),   # key
                  _time)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lefts=st.lists(_pair, min_size=1, max_size=25),
       rights=st.sets(_pair, min_size=1, max_size=25),
       null_every=st.integers(min_value=2, max_value=5))
def test_asof_join_matches_duckdb(spark, lefts, rights, null_every):
    """For arbitrary (key, time) multisets on the left and unique (key,
    time) sets on the right (the documented contract), the union+window
    construction agrees with DuckDB's native ASOF JOIN row-for-row —
    including NULL right values, which must surface as NULL in the match
    (not fall through to a stale older row's value), and NULL times on
    either side, which must never fabricate a match."""
    import duckdb

    from hugegraph_on_tikv_spark.operators.joins import asof_join

    l_rows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    r_rows = [(k, t, None if t is None or (k + t) % null_every == 0 else 100 * k + t)
              for (k, t) in rights]
    left = spark.createDataFrame(l_rows, "k long, t long, v long")
    right = spark.createDataFrame(r_rows, "k long, t long, p long")
    got = sorted((r["k"], r["t"], r["v"], r["t_right"], r["p_right"])
                 for r in asof_join(left, right, "k", "t", ["p"]).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", l_rows)
    con.execute("CREATE TABLE r(k BIGINT, t BIGINT, p BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", r_rows)
    # DuckDB's native ASOF quirk: its sort-merge pairs a NULL-time left row
    # with a NULL-time right row (NULL treated as a sortable value).  Our
    # contract is standard SQL comparison semantics — NULL never satisfies
    # l.t >= r.t — so the oracle filters NULL times explicitly; the Spark
    # side must do the same internally (no filter on `got`).
    want = sorted(map(tuple, con.execute(
        "SELECT l.k, l.t, l.v, r.t, r.p "
        "FROM (SELECT * FROM l WHERE t IS NOT NULL) l "
        "ASOF JOIN (SELECT * FROM r WHERE t IS NOT NULL) r "
        "ON l.k = r.k AND l.t >= r.t").fetchall()))
    assert got == want


# -- heavy hitters: MG candidates + verify == exact, any data shape ---------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    values=st.lists(st.integers(min_value=0, max_value=20),
                    min_size=1, max_size=300),
    threshold=st.sampled_from([0.05, 0.1, 0.3]),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_heavy_hitters_matches_exact_model(spark, values, threshold, n_parts):
    """heavy_hitters must equal the exact counter model for every value
    distribution, threshold, and partitioning — the superset guarantee is
    what the property exercises (a lossy candidate pass would drop a true
    hitter for SOME layout)."""
    import math
    from collections import Counter

    from hugegraph_on_tikv_spark.functions.sketches import heavy_hitters

    df = spark.createDataFrame([(str(v),) for v in values], "v string") \
        .repartition(n_parts)
    got = {(r["value"], r["n_occurrences"])
           for r in heavy_hitters(df, "v", threshold).collect()}
    support = math.ceil(threshold * len(values))
    want = {(str(v), c) for v, c in Counter(values).items() if c >= support}
    assert got == want


# -- media codec round-trips on arbitrary arrays (pure python, fast) --------

@settings(deadline=None)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_ppm_round_trip_property(h, w, seed):
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm)

    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)


@settings(deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, channels, rate, seed):
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_wav, encode_wav)

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=(n, channels)).astype(np.int16)
    if channels == 1:
        s = s[:, 0]
    back, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    want = s.reshape(-1, 1) if channels == 1 else s
    assert np.array_equal(back, want)


# -- chunking reconstruction property (small Spark frames) ------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
def test_chunk_documents_reconstructs_stream(spark, n_tokens, chunk, overlap):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0) and
    concatenating in chunk order reproduces the token stream exactly —
    no token lost, none duplicated, for every (chunk, overlap) geometry."""
    from hypothesis import assume

    from hugegraph_on_tikv_spark.functions.text import chunk_documents

    assume(overlap < chunk)
    words = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=chunk,
                                  overlap=overlap).collect(),
                  key=lambda r: r["chunk_id"])
    if n_tokens == 0:
        assert rows == []
        return
    rebuilt: list[str] = []
    for r in rows:
        toks = r["chunk_text"].split()
        assert len(toks) == r["n_tokens"] <= chunk
        rebuilt.extend(toks if r["chunk_id"] == 0 else toks[overlap:])
    assert rebuilt == words


# -- prefix-filter completeness on random set families ----------------------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_docs=st.integers(min_value=2, max_value=12),
    vocab=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    threshold=st.sampled_from([0.34, 0.5, 0.75, 1.0]),
)
def test_set_similarity_join_complete_random(spark, n_docs, vocab, seed,
                                             threshold):
    import random

    from hugegraph_on_tikv_spark.functions.dedup import set_similarity_join

    rng = random.Random(seed)
    rows = [(f"{i:02d}",
             sorted({f"t{rng.randrange(vocab)}"
                     for _ in range(rng.randrange(0, vocab + 1))}))
            for i in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<string>")

    def jac(a, b):
        a, b = set(a), set(b)
        u = len(a | b)
        return len(a & b) / u if u else 0.0

    import itertools
    want = {(x[0], y[0]) for x, y in itertools.combinations(rows, 2)
            if round(jac(x[1], y[1]), 6) >= threshold}
    got = {(r["id_a"], r["id_b"])
           for r in set_similarity_join(df, threshold=threshold).collect()}
    assert got == want, (rows, threshold)


# -- substring-span dedup vs brute force on random planted copies ------------

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       n=st.sampled_from([3, 4, 5]))
def test_duplicated_spans_match_bruteforce_random(spark, seed, n):
    """duplicated_spans == a brute-force per-pair maximal-common-span scan
    on random small-vocab corpora (accidental repeats guaranteed), with
    planted copies.  Brute force: for every doc pair and every diagonal,
    merge runs of positions whose n-token windows match."""
    import random

    from hugegraph_on_tikv_spark.functions.dedup import duplicated_spans

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(6)]
    toks = {d: [rng.choice(vocab) for _ in range(rng.randrange(n, 25))]
            for d in range(1, 6)}
    # plant one definite copy
    src = toks[1]
    if len(src) >= n:
        lo = rng.randrange(0, len(src) - n + 1)
        hi = min(len(src), lo + rng.randrange(n, n + 8))
        toks[2] = toks[2][:3] + src[lo:hi] + toks[2][3:]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()], "doc_id long, text string")

    def windows(t):
        return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]

    want = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            wa, wb = windows(toks[a]), windows(toks[b])
            hit = {(pa, pb) for pa, ga in enumerate(wa)
                   for pb, gb in enumerate(wb) if ga == gb}
            for diag in {pa - pb for pa, pb in hit}:
                run = sorted(pa for pa, pb in hit if pa - pb == diag)
                s = run[0]
                for prev, cur in zip(run, run[1:] + [None]):
                    if cur is None or cur != prev + 1:
                        want.add((a, b, s, s - diag, prev - s + n))
                        s = cur
    got = {(r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
           for r in duplicated_spans(docs, n=n, max_docs_per_gram=99).collect()}
    assert got == want, (toks, n)


@settings(deadline=None)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    gray=st.booleans(),
    filters=st.lists(st.integers(min_value=0, max_value=4),
                     min_size=1, max_size=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_property(h, w, gray, filters, seed):
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_png, encode_png)

    rng = np.random.RandomState(seed)
    if gray:
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        want = np.repeat(img[:, :, None], 3, axis=2)
    else:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        want = img
    assert np.array_equal(decode_png(encode_png(img, filters=filters)), want)


@settings(deadline=None)
@given(
    h=st.integers(min_value=1, max_value=8),
    w=st.integers(min_value=1, max_value=8),
    n_frames=st.integers(min_value=1, max_value=4),
    pal_n=st.sampled_from([4, 16, 256]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_round_trip_property(h, w, n_frames, pal_n, seed):
    import numpy as np

    from hugegraph_on_tikv_spark.functions.multimodal import (
        decode_gif, encode_gif)

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(pal_n, 3), dtype=np.uint8)
    frames = [rng.randint(0, pal_n, size=(h, w)).astype(np.uint8)
              for _ in range(n_frames)]
    out = decode_gif(encode_gif(frames, pal))
    assert len(out) == n_frames
    for idx, rgb in zip(frames, out):
        assert np.array_equal(rgb, pal[idx])


_WORD = st.text(alphabet="abcd", min_size=1, max_size=3)


@settings(deadline=None, max_examples=12,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(st.lists(_WORD, min_size=0, max_size=12), min_size=1,
                   max_size=12),
    head=st.integers(min_value=1, max_value=6),
)
def test_lm_two_path_join_property(spark, texts, head):
    """Any corpus, any head size: the two-path (head-broadcast /
    tail-shuffle) model join equals the all-in-one-join scores."""
    from hugegraph_on_tikv_spark.functions import lm

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string")
    a = {r.doc_id: (r.n_scored, r.sum_p_scaled)
         for r in lm.lm_score(df, head_size=head).collect()}
    b = {r.doc_id: (r.n_scored, r.sum_p_scaled)
         for r in lm.lm_score(df, head_size=100_000).collect()}
    assert a == b


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys_a=st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                    max_size=40),
    keys_b=st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                    max_size=40),
)
def test_kmv_join_size_exact_when_k_covers_domain(spark, keys_a, keys_b):
    """k >= |domain| makes the KMV 'estimate' exactly the true join size,
    for any multiplicity profile on either side."""
    from hypothesis import assume

    from hugegraph_on_tikv_spark.functions import stats

    assume(keys_a and keys_b)
    a = spark.createDataFrame([(k,) for k in keys_a], "k long")
    b = spark.createDataFrame([(k,) for k in keys_b], "k long")
    exact = stats.join_size_exact(a, b, "k").collect()[0].join_rows
    kmv = stats.join_size_kmv(a, b, "k", k=1000).collect()[0]
    assert kmv.sampled_product == exact
    assert kmv.estimate_scaled == exact * 1_000_000


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(st.lists(_WORD, min_size=0, max_size=14), min_size=1,
                    max_size=8),
    ev=st.lists(st.lists(_WORD, min_size=0, max_size=14), min_size=1,
                max_size=4),
    bits_pow=st.integers(min_value=6, max_value=14),
)
def test_bloom_decontam_equals_set_mode_property(spark, corpus, ev, bits_pow):
    """For ANY corpus/eval pair and ANY filter size (down to 64 bits,
    where nearly everything is a false positive), bloom mode returns the
    identical contamination report."""
    from hugegraph_on_tikv_spark.functions.dedup import contamination_report

    cdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus)],
        "doc_id long, text string")
    edf = spark.createDataFrame(
        [(100 + i, " ".join(t)) for i, t in enumerate(ev)],
        "doc_id long, text string")
    want = {r.doc_id: r.asDict()
            for r in contamination_report(cdf, edf, n=2).collect()}
    got = {r.doc_id: r.asDict()
           for r in contamination_report(cdf, edf, n=2, mode="bloom",
                                         bloom_bits=1 << bits_pow).collect()}
    assert got == want
