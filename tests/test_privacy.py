"""Privacy audits (functions/privacy.py): k-anonymity, l-diversity,
suppression — exact-integer group semantics, NULL handling, and the
suppression/report consistency contract."""

from __future__ import annotations

import pytest

from hugegraph_on_tikv_spark.functions import privacy


def _people(spark):
    rows = [
        # (id, zip3, age_band, disease)
        (1, "021", "30s", "flu"),
        (2, "021", "30s", "flu"),
        (3, "021", "30s", "cold"),
        (4, "946", "40s", "flu"),          # singleton group
        (5, "100", "20s", "flu"),
        (6, "100", "20s", "flu"),          # 2-group, homogeneous
        (7, None, "50s", "cold"),
        (8, None, "50s", None),            # NULL quasi group of 2
    ]
    return spark.createDataFrame(
        rows, "id long, zip3 string, age string, disease string")


def test_k_anonymity_report_and_level(spark):
    df = _people(spark)
    rep = {(r.zip3, r.age): r.n_rows
           for r in privacy.k_anonymity_report(df, ["zip3", "age"], 3).collect()}
    assert rep == {("946", "40s"): 1, ("100", "20s"): 2, (None, "50s"): 2}
    lvl = privacy.anonymity_level(df, ["zip3", "age"]).collect()[0]
    assert (lvl.k_level, lvl.n_groups, lvl.n_rows_at_risk) == (1, 4, 1)


def test_l_diversity_homogeneous_group_flagged(spark):
    df = _people(spark)
    rep = {(r.zip3, r.age): (r.n_rows, r.n_distinct_sensitive)
           for r in privacy.l_diversity_report(
               df, ["zip3", "age"], "disease", 2).collect()}
    # 100/20s: 2 rows, all 'flu' -> 1 distinct; 946/40s singleton;
    # NULL/50s has cold + NULL -> only 1 non-NULL distinct value
    assert rep == {("100", "20s"): (2, 1), ("946", "40s"): (1, 1),
                   (None, "50s"): (2, 1)}
    # the 021/30s group (flu, flu, cold) is 2-diverse — absent
    ok = privacy.l_diversity_report(df, ["zip3", "age"], "disease", 2)
    assert ("021",) not in {(r.zip3,) for r in ok.collect()}


def test_suppress_to_k_drops_exactly_violating_groups(spark):
    df = _people(spark)
    kept = privacy.suppress_to_k(df, ["zip3", "age"], 3)
    assert sorted(r.id for r in kept.collect()) == [1, 2, 3]
    # post-suppression the table IS k-anonymous
    assert privacy.k_anonymity_report(kept, ["zip3", "age"], 3).count() == 0
    # NULL quasi groups are suppressed too (they are linkable combinations)
    assert 7 not in {r.id for r in kept.collect()}


def test_suppress_noop_when_already_anonymous(spark):
    df = _people(spark)
    kept = privacy.suppress_to_k(df, ["zip3", "age"], 1)
    assert kept.count() == df.count()


def test_parameter_validation(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="k must be"):
        privacy.k_anonymity_report(df, ["zip3"], 0)
    with pytest.raises(ValueError, match="l must be"):
        privacy.l_diversity_report(df, ["zip3"], "disease", 0)


def test_t_closeness_exact_rational(spark):
    from fractions import Fraction

    # group A: 3x red, 1x blue; group B: 2x blue; global: 3 red, 3 blue
    rows = [("A", "red")] * 3 + [("A", "blue")] + [("B", "blue")] * 2
    df = spark.createDataFrame(rows, "g string, colour string")
    got = {r.g: r for r in
           privacy.t_closeness_report(df, ["g"], "colour").collect()}
    for g, n_g, dist in (("A", 4, {"red": 3, "blue": 1}),
                         ("B", 2, {"red": 0, "blue": 2})):
        expected = sum(
            abs(Fraction(dist[s], n_g) - Fraction(3, 6))
            for s in ("red", "blue")) / 2
        r = got[g]
        assert Fraction(int(r.tvd_num), int(r.tvd_den)) == expected
        assert r.n_rows == n_g
        assert abs(r.tvd - float(expected)) < 1e-12
    # identical-to-global distribution => tvd 0
    uniform = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")], "g string, s string")
    for r in privacy.t_closeness_report(uniform, ["g"], "s").collect():
        assert int(r.tvd_num) == 0 and r.tvd == 0.0


def test_t_closeness_null_sensitive_excluded(spark):
    rows = [("A", "red"), ("A", None), ("B", "red"), ("B", "blue")]
    df = spark.createDataFrame(rows, "g string, s string")
    got = {r.g: r for r in
           privacy.t_closeness_report(df, ["g"], "s").collect()}
    # base: A has 1 red; B has 1 red 1 blue; global 2 red 1 blue of 3
    assert got["A"].n_rows == 1
    from fractions import Fraction
    exp_a = (abs(Fraction(1, 1) - Fraction(2, 3))
             + abs(Fraction(0, 1) - Fraction(1, 3))) / 2
    assert Fraction(int(got["A"].tvd_num), int(got["A"].tvd_den)) == exp_a
