"""Column profiling (functions/profiling.py) and versioned-catalog CDC
(TableCatalog.table_changes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions.profiling import profile_table
from hugegraph_on_tikv_spark.operators.mutations import MutationBatch
from hugegraph_on_tikv_spark.sources.table_catalog import TableCatalog


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (3, 1.0, "y"), (3, 4.0, None)],
        "a long, b double, c string",
    )


def test_profile_numeric_exact(df):
    got = {r["column"]: r for r in profile_table(df, ["a", "b"]).collect()}
    assert set(got) == {"a", "b"}
    ra = got["a"]
    assert (ra["n_rows"], ra["n_nonnull"], ra["n_distinct"]) == (4, 4, 3)
    assert (ra["min_value"], ra["max_value"]) == (1.0, 3.0)
    rb = got["b"]
    assert (rb["n_nonnull"], rb["n_distinct"]) == (3, 3)
    assert (rb["min_value"], rb["max_value"]) == (1.0, 4.0)


def test_profile_mixed_types_degrade_to_string(df):
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["c"]["min_value"] == "x" and got["c"]["max_value"] == "y"
    assert got["a"]["min_value"] == "1"  # whole call shares one schema
    assert got["c"]["n_nonnull"] == 3 and got["c"]["n_distinct"] == 2


def test_profile_approx_single_pass(df):
    exact = {r["column"]: r["n_distinct"]
             for r in profile_table(df, ["a"]).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in profile_table(df, ["a"], approx=True).collect()}
    # tiny input: HLL is exact here; at scale it is the no-expand path
    assert approx == exact
    plan = profile_table(df, ["a", "b"], approx=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = profile_table(df, ["a", "b"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # documents WHY approx is the scale path


def test_profile_bad_columns(df):
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df, [])


def _mk_catalog(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "cat"))


def test_table_changes_insert_update_delete_noop(spark, tmp_path):
    cat = _mk_catalog(spark, tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, name string, v long")
    cat.create_table("t", base, key="id")          # v1
    batch = MutationBatch()
    batch.upsert_df("t", spark.createDataFrame(
        [(2, "B", 20),      # update (name changed)
         (3, "c", 30),      # no-op replay: identical row, must not appear
         (5, "e", 50)],     # insert
        "id long, name string, v long"))
    batch.delete("t", 4)                            # delete
    cat.commit(batch)                               # v2

    rows = {(r["id"], r["_change_type"]): r
            for r in cat.table_changes("t", 1, 2).collect()}
    assert set(rows) == {(2, "update"), (5, "insert"), (4, "delete")}
    assert rows[(2, "update")]["name"] == "B"       # after-image
    assert rows[(4, "delete")]["name"] == "d"       # before-image
    assert rows[(5, "insert")]["v"] == 50


def test_table_changes_idempotent_replay_is_empty(spark, tmp_path):
    cat = _mk_catalog(spark, tmp_path)
    base = spark.createDataFrame([(1, "a")], "id long, name string")
    cat.create_table("t", base, key="id")
    cat.upsert("t", base)                           # replay of same rows
    assert cat.table_changes("t", 1, 2).count() == 0


def test_table_changes_across_schema_evolution(spark, tmp_path):
    cat = _mk_catalog(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"), key="id")
    cat.add_column("t", "score", "double", default=0.0)   # v2: every row
    diff = cat.table_changes("t", 1, 2).collect()
    # added-column backfill alone is not an update (column not common);
    # nothing else changed
    assert diff == []
    cat.upsert("t", spark.createDataFrame(
        [(2, "b2", 1.5)], "id long, name string, score double"))  # v3
    rows = {r["id"]: r for r in cat.table_changes("t", 2, 3).collect()}
    assert set(rows) == {2} and rows[2]["score"] == 1.5


def test_table_changes_unretained_version_refuses(spark, tmp_path):
    cat = _mk_catalog(spark, tmp_path)
    cat.create_table("t", spark.createDataFrame([(1, "a")],
                                                "id long, name string"),
                     key="id")
    cat.upsert("t", spark.createDataFrame([(1, "x")], "id long, name string"))
    cat.upsert("t", spark.createDataFrame([(1, "y")], "id long, name string"))
    with pytest.raises(ValueError, match="not retained"):
        cat.table_changes("t", 1, 3)


def test_corr_pairs_known_values(spark):
    import math

    from hugegraph_on_tikv_spark.functions.profiling import corr_pairs

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
         (4.0, 8.5, -4.0)],
        "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_pairs(df, ["x", "y", "z"], scale=100).collect()}
    # x,z perfectly anti-correlated; x,y nearly perfectly correlated
    assert got[("x", "z")] == pytest.approx(-1.0)
    assert got[("x", "y")] == pytest.approx(0.9993, abs=1e-3)
    assert math.isfinite(got[("y", "z")])


def test_corr_pairs_null_rows_dropped(spark):
    from hugegraph_on_tikv_spark.functions.profiling import corr_pairs

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (None, 9.0), (4.0, None)],
        "x double, y double")
    got = corr_pairs(df, ["x", "y"]).collect()[0]["corr"]
    assert got == pytest.approx(1.0)


def test_scd2_from_changes_semantics(spark):
    from hugegraph_on_tikv_spark.operators.mutations import scd2_from_changes

    changes = spark.createDataFrame(
        [(1, "a", 1, "insert"), (1, "b", 3, "update"), (1, None, 5, "delete"),
         (2, "x", 2, "insert")],
        "id long, val string, batch_id long, _change_type string")
    rows = {(r["id"], r["valid_from"]): r
            for r in scd2_from_changes(changes, ["id"]).collect()}
    # key 1: [1,3) closed by update; [3,5) closed by the DELETE; nothing open
    assert rows[(1, 1)]["valid_to"] == 3 and not rows[(1, 1)]["is_current"]
    assert rows[(1, 3)]["valid_to"] == 5 and not rows[(1, 3)]["is_current"]
    assert (1, 5) not in rows                      # delete opens no segment
    # key 2: one open segment
    assert rows[(2, 2)]["valid_to"] is None and rows[(2, 2)]["is_current"]


def test_table_checksum_order_and_partitioning_invariant(spark):
    from hugegraph_on_tikv_spark.functions.profiling import table_checksum

    rows = [(i, f"name{i}", i % 3) for i in range(100)]
    a = spark.createDataFrame(rows, "id long, name string, g int")
    b = spark.createDataFrame(list(reversed(rows)),
                              "id long, name string, g int").repartition(7)
    ca = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in table_checksum(a, buckets=8, id_col="id").collect()}
    cb = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in table_checksum(b, buckets=8, id_col="id").collect()}
    assert ca == cb and sum(v[0] for v in ca.values()) == 100


def test_checksum_diff_localizes_change(spark):
    from hugegraph_on_tikv_spark.functions.profiling import (checksum_diff,
                                                             table_checksum)

    rows = [(i, f"name{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, name string")
    mutated = [(i, "CHANGED" if i == 42 else f"name{i}") for i in range(100)]
    b = spark.createDataFrame(mutated, "id long, name string")
    ca = table_checksum(a, buckets=8, id_col="id")
    cb = table_checksum(b, buckets=8, id_col="id")
    diff = checksum_diff(ca, cb).collect()
    assert len(diff) == 1            # exactly the bucket holding id 42
    assert diff[0]["n_a"] == diff[0]["n_b"]   # same cardinality, new bytes
    assert checksum_diff(ca, ca).count() == 0


def test_table_checksum_null_vs_empty_distinct(spark):
    from hugegraph_on_tikv_spark.functions.profiling import table_checksum

    a = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    b = spark.createDataFrame([(1, "x", None)], "id long, a string, b string")
    ha = table_checksum(a, id_col="id").collect()[0]["checksum"]
    hb = table_checksum(b, id_col="id").collect()[0]["checksum"]
    assert ha != hb                  # the NUL sentinel keeps fields aligned


def test_table_checksum_separator_injective(spark):
    """ADVICE r5: values containing the '|' separator must not shift column
    boundaries — ('a|b','c') and ('a','b|c') checksum differently."""
    from hugegraph_on_tikv_spark.functions.profiling import table_checksum

    a = spark.createDataFrame([(1, "a|b", "c")], "id long, x string, y string")
    b = spark.createDataFrame([(1, "a", "b|c")], "id long, x string, y string")
    ha = table_checksum(a, cols=["x", "y"], id_col="id").collect()[0]["checksum"]
    hb = table_checksum(b, cols=["x", "y"], id_col="id").collect()[0]["checksum"]
    assert ha != hb
    # escape char itself round-trips injectively too
    c = spark.createDataFrame([(1, "a\\", "|b")], "id long, x string, y string")
    d = spark.createDataFrame([(1, "a\\|b", None)], "id long, x string, y string")
    hc = table_checksum(c, cols=["x", "y"], id_col="id").collect()[0]["checksum"]
    hd = table_checksum(d, cols=["x", "y"], id_col="id").collect()[0]["checksum"]
    assert hc != hd


def test_corr_pairs_overflow_raises(spark):
    """ADVICE r5: quantization overflow must fail loudly, not NULL-skip."""
    import pytest as _pytest
    from hugegraph_on_tikv_spark.functions.profiling import corr_pairs

    df = spark.createDataFrame([(1e18, 1.0), (2.0, 2.0)], "a double, b double")
    with _pytest.raises(Exception, match="corr_pairs"):
        corr_pairs(df, ["a", "b"], scale=100).collect()
    # in-range values still work
    ok = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)],
                               "a double, b double")
    r = corr_pairs(ok, ["a", "b"], scale=100).collect()[0]["corr"]
    assert abs(r - 1.0) < 1e-9


def test_hybrid_search_custom_vec_id_col(spark):
    """ADVICE r5: vec_id_col must reach cosine_topk."""
    from hugegraph_on_tikv_spark.functions.ranking import hybrid_search

    docs = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, "pandas arrow batch"),
         (3, "spark broadcast join")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
        "emb_id long, embedding array<double>")
    qv = spark.createDataFrame([(99, [1.0, 0.0])],
                               "emb_id long, embedding array<double>")
    out = hybrid_search(docs, emb, ["spark", "join"], qv, k=3,
                        vec_id_col="emb_id").collect()
    assert len(out) > 0 and out[0]["rank"] == 1


def test_histogram_bins_and_edges(spark):
    from hugegraph_on_tikv_spark.functions.profiling import histogram

    df = spark.createDataFrame([(float(i),) for i in range(10)] + [(None,)],
                               "x double")
    rows = {r["bin"]: r for r in histogram(df, "x", nbins=3).collect()}
    # range [0,9], width 3: bins [0,3) [3,6) [6,9] — max closes into last
    assert {b: rows[b]["n"] for b in rows} == {0: 3, 1: 3, 2: 4}
    assert rows[0]["bin_lo"] == 0.0 and rows[2]["bin_hi"] == 9.0
    assert sum(r["n"] for r in rows.values()) == 10   # NULL dropped


def test_histogram_constant_column(spark):
    from hugegraph_on_tikv_spark.functions.profiling import histogram

    df = spark.createDataFrame([(5.0,)] * 4, "x double")
    rows = histogram(df, "x", nbins=4).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 4


def test_histogram_equidepth_bins(spark):
    from hugegraph_on_tikv_spark.functions.profiling import histogram_equidepth

    df = spark.createDataFrame([(float(i),) for i in range(1, 13)], "x double")
    rows = {r["bin"]: r for r in histogram_equidepth(df, "x", nbins=4).collect()}
    # 12 values into 4 bins of 3; edges are actual data values
    assert {b: rows[b]["n"] for b in rows} == {0: 3, 1: 3, 2: 3, 3: 3}
    assert rows[0]["bin_hi"] == 3.0 and rows[3]["bin_hi"] == 12.0


def test_histogram_equidepth_duplicate_heavy(spark):
    from hugegraph_on_tikv_spark.functions.profiling import histogram_equidepth

    df = spark.createDataFrame([(1.0,)] * 9 + [(5.0,)], "x double")
    rows = {r["bin"]: r["n"] for r in
            histogram_equidepth(df, "x", nbins=4).collect()}
    # repeated edges: all the 1.0s land in bin 0, the 5.0 in the last bin
    assert rows[0] == 9 and rows[3] == 1 and 1 not in rows


def test_corpus_top_ngrams(spark):
    from hugegraph_on_tikv_spark.functions.text import corpus_top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, None)],
        "doc_id long, text string")
    got = [(r["ngram"], r["n_occurrences"], r["rank"])
           for r in corpus_top_ngrams(docs, n=2, k=3).orderBy("rank").collect()]
    # 'a b' occurs 3x (twice in doc 1, once in doc 2)
    assert got[0] == ("a b", 3, 1)
    assert {g[0] for g in got} <= {"a b", "b a", "b c", "b x"}
    assert len(got) == 3


def test_expectations_report_and_enforce(spark):
    import pytest as _pytest
    from hugegraph_on_tikv_spark.functions.profiling import (
        enforce_expectations, expectations_report)

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "F"), (3, None, "X")],
        "id long, amount double, status string")
    rep = {r["check_name"]: (r["n_rows"], r["n_violations"])
           for r in expectations_report(df, {
               "amount_positive": "amount > 0",
               "status_domain": "status IN ('O', 'F')",
               "id_nonnull": "id IS NOT NULL",
           }).collect()}
    # NULL amount counts as a violation (strict TRUE-only semantics)
    assert rep == {"amount_positive": (3, 2),
                   "status_domain": (3, 1),
                   "id_nonnull": (3, 0)}

    with _pytest.raises(ValueError, match="amount_positive: 2/3"):
        enforce_expectations(df, {"amount_positive": "amount > 0"})
    # clean check passes rows through unchanged
    assert enforce_expectations(df, {"id_nonnull": "id IS NOT NULL"}) is df
    with _pytest.raises(ValueError, match="quotes"):
        expectations_report(df, {"bad'name": "id IS NOT NULL"})


# -- MAD-based robust anomaly detection --------------------------------------

def test_mad_outliers_flags_extreme_not_dragged(spark):
    """One huge value must be flagged, and must NOT drag the threshold the
    way a mean/stddev rule would (the robustness property)."""
    from hugegraph_on_tikv_spark.functions.profiling import mad_outliers

    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 1000.0, 10.2]
    df = spark.createDataFrame([("a", i, v) for i, v in enumerate(vals)],
                               "g string, rid long, value double")
    out = mad_outliers(df, "value", ["g"], "rid", k=(3, 1))
    rows = out.collect()
    assert [r.row_id for r in rows] == [6]          # only the 1000.0
    r = rows[0]
    # med of cents {950,1000,1020,1050,1100,1150,1200,100000} -> 1050
    assert r.med == 1050
    assert r.dev == 100000 - 1050
    assert r.robust_z == pytest.approx(r.dev / r.mad)


def test_mad_outliers_zero_mad_group(spark):
    """A constant group has MAD 0: any deviation is an outlier and
    robust_z is NULL (no division blow-up)."""
    from hugegraph_on_tikv_spark.functions.profiling import mad_outliers

    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(6)] + [("c", 9, 5.01)],
        "g string, rid long, value double")
    rows = mad_outliers(df, "value", ["g"], "rid").collect()
    assert [(r.row_id, r.mad, r.robust_z) for r in rows] == [(9, 0, None)]


def test_mad_outliers_rational_k_and_validation(spark):
    from hugegraph_on_tikv_spark.functions.profiling import mad_outliers

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7])],
        "g string, rid long, value double")
    # med=400c, devs {0,100,100,200,200,300,300}c, mad=200c:
    # k=5/4 flags dev*4 > 5*200, i.e. dev > 250
    rows = mad_outliers(df, "value", ["g"], "rid", k=(5, 4)).collect()
    assert sorted(r.v for r in rows) == [100, 700]
    with pytest.raises(ValueError, match="positive rational"):
        mad_outliers(df, "value", ["g"], "rid", k=(0, 1))


def test_mad_outliers_groups_are_independent(spark):
    from hugegraph_on_tikv_spark.functions.profiling import mad_outliers

    df = spark.createDataFrame(
        [("lo", i, float(v)) for i, v in enumerate([1, 1, 1, 1, 50])]
        + [("hi", i, float(v)) for i, v in enumerate([50, 50, 50, 50, 50])],
        "g string, rid long, value double")
    rows = mad_outliers(df, "value", ["g"], "rid").collect()
    assert [(r.g, r.row_id) for r in rows] == [("lo", 4)]  # 50 is normal in 'hi'
