"""Fellegi-Sunter probabilistic record linkage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.functions import linkage


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "id long, blk int, name string, city string")


def test_fs_link_recovers_true_pairs_and_ranks_partials_below(spark):
    """Identical records outrank single-field agreements, which outrank
    pure-chance pairs; NULL counts as disagreement."""
    left = _mk(spark, [
        (1, 0, "alice", "rome"),
        (2, 0, "bob", "oslo"),
        (3, 0, "carol", None),
    ])
    right = _mk(spark, [
        (11, 0, "alice", "rome"),     # true match of 1
        (12, 0, "bob", "cairo"),      # partial match of 2 (name only)
        (13, 0, "dave", "quito"),     # nobody
        (14, 0, "carol", None),       # name agrees with 3; city NULL-NULL
    ])
    got = linkage.fs_link(left, right, block_on=["blk"],
                          fields=["name", "city"],
                          m=0.9, upper=10.0, lower=0.2)
    w = {(r["l_id"], r["r_id"]): (r["weight"], r["decision"],
                                  r["agr_name"], r["agr_city"])
         for r in got.collect()}
    assert w[(1, 11)][1] == "match"
    assert w[(1, 11)][0] > w[(2, 12)][0] > 0.2
    assert w[(2, 12)][2:] == (1, 0)
    # NULL city never agrees — (3,14) scores exactly like (2,12)'s shape
    assert w[(3, 14)][2:] == (1, 0)
    assert (3, 13) not in w and (2, 13) not in w   # chance pairs cut at lower


def test_fs_link_blocking_scopes_candidates(spark):
    """Same name in a different block never becomes a candidate."""
    left = _mk(spark, [(1, 0, "alice", "rome")])
    right = _mk(spark, [(11, 1, "alice", "rome"),
                        (12, 1, "zed", "lima")])
    assert linkage.fs_link(left, right, block_on=["blk"],
                           fields=["name", "city"], lower=0.0).count() == 0


def test_fs_weight_is_exact_product_of_literal_ratios(spark):
    """The weight equals the hand-computed fixed-order odds-ratio product
    bit-for-bit (the determinism contract the driver oracle relies on)."""
    left = _mk(spark, [(1, 0, "x", "a")])
    right = _mk(spark, [(10, 0, "x", "b"), (11, 0, "y", "a"),
                        (12, 0, "y", "b")])
    u = linkage.field_u_stats(right, ["name", "city"])
    got = {(r["l_id"], r["r_id"]): r["weight"]
           for r in linkage.fs_link(left, right, block_on=["blk"],
                                    fields=["name", "city"],
                                    m=0.8, lower=0.0).collect()}
    (s_n, nn), (s_c, _) = u["name"], u["city"]
    # (1.0 - 0.8) != 0.2 in IEEE doubles — mirror the implementation's
    # literal computation order exactly
    a_n, d_n = (0.8 * nn) / s_n, ((1.0 - 0.8) * nn) / (nn - s_n)
    a_c, d_c = (0.8 * nn) / s_c, ((1.0 - 0.8) * nn) / (nn - s_c)
    assert got[(1, 10)] == 1.0 * a_n * d_c
    assert got[(1, 11)] == 1.0 * d_n * a_c
    assert got[(1, 12)] == 1.0 * d_n * d_c


def test_fs_degenerate_u_raises(spark):
    """A field where all right values are identical (u = 1) has no
    discriminating power — the scorer refuses it loudly."""
    import pytest

    left = _mk(spark, [(1, 0, "x", "a")])
    right = _mk(spark, [(10, 0, "x", "same"), (11, 0, "y", "same")])
    with pytest.raises(ValueError, match="degenerate"):
        linkage.fs_link(left, right, block_on=["blk"],
                        fields=["name", "city"])


def test_fs_m_probability_validation(spark):
    import pytest

    left = _mk(spark, [(1, 0, "x", "a")])
    right = _mk(spark, [(10, 0, "x", "b"), (11, 0, "y", "a")])
    for bad in (0.0, 1.0, 1.5, -0.2):
        with pytest.raises(ValueError, match="probability"):
            linkage.fs_link(left, right, block_on=["blk"],
                            fields=["name", "city"], m=bad)


# -- ER clustering + golden records ------------------------------------------

def test_er_clusters_transitive_merge(spark):
    """L1-R1 and L2-R1 must land in ONE cluster (transitivity through the
    shared right record), and the cluster id is the min encoded node."""
    pairs = spark.createDataFrame([(1, 1), (2, 1), (5, 7)],
                                  "l_id long, r_id long")
    rows = {(r.side, r.rec_id): r.cluster_id
            for r in linkage.er_clusters(pairs).collect()}
    assert rows[("L", 1)] == rows[("L", 2)] == rows[("R", 1)] == 2  # 2*1
    assert rows[("L", 5)] == rows[("R", 7)] == 10                   # 2*5
    assert len(rows) == 5


def test_er_clusters_id_collision_between_sides(spark):
    """Left id 3 and right id 3 are DIFFERENT records: if they are not
    matched to each other they must not share a cluster."""
    pairs = spark.createDataFrame([(3, 8), (9, 3)], "l_id long, r_id long")
    rows = {(r.side, r.rec_id): r.cluster_id
            for r in linkage.er_clusters(pairs).collect()}
    assert rows[("L", 3)] == rows[("R", 8)]
    assert rows[("L", 9)] == rows[("R", 3)]
    assert rows[("L", 3)] != rows[("R", 3)]


def test_golden_records_majority_and_string_safe_tiebreak(spark):
    left = _mk(spark, [(1, 0, "Ann", "NYC"), (2, 0, "Ann", None)])
    right = _mk(spark, [(7, 0, "ann", "NYC")])
    clusters = spark.createDataFrame(
        [("L", 1, 100), ("L", 2, 100), ("R", 7, 100)],
        "side string, rec_id long, cluster_id long")
    row = linkage.golden_records(clusters, left, right,
                                 ["name", "city"]).collect()[0]
    assert row.n_members == 3
    assert row.name == "Ann"          # majority 2-1 over 'ann'
    assert row.city == "NYC"          # NULL excluded from the vote
    # frequency tie on a STRING field breaks to MIN (no id negation)
    left2 = _mk(spark, [(1, 0, "Zed", "LA"), (2, 0, "Abe", "SF")])
    right2 = _mk(spark, [(9, 0, "Zed", "SF")])
    clusters2 = spark.createDataFrame(
        [("L", 1, 2), ("L", 2, 2), ("R", 9, 2)],
        "side string, rec_id long, cluster_id long")
    row2 = linkage.golden_records(clusters2, left2, right2,
                                  ["name", "city"]).collect()[0]
    assert row2.name == "Zed"         # 2-1 majority
    assert row2.city == "SF"          # 2-1 majority
    clusters3 = spark.createDataFrame(
        [("L", 1, 2), ("L", 2, 2)], "side string, rec_id long, cluster_id long")
    row3 = linkage.golden_records(clusters3, left2, right2,
                                  ["name", "city"]).collect()[0]
    assert row3.name == "Abe"         # 1-1 tie -> min string
    assert row3.city == "LA"          # 1-1 tie -> min string


def test_golden_records_all_null_field_stays_null(spark):
    left = _mk(spark, [(1, 0, "A", None)])
    right = _mk(spark, [(5, 0, "A", None)])
    clusters = spark.createDataFrame([("L", 1, 2), ("R", 5, 2)],
                                     "side string, rec_id long, cluster_id long")
    row = linkage.golden_records(clusters, left, right,
                                 ["name", "city"]).collect()[0]
    assert row.name == "A" and row.city is None


def test_er_resolve_end_to_end(spark):
    """Exact duplicates resolve into 2-member entities with the shared
    values surviving; unmatched records stay out of the golden set."""
    left = _mk(spark, [(1, 0, "Ann Lee", "NYC"), (2, 0, "Bob Roy", "LA"),
                       (3, 1, "Cy Day", "SF")])
    right = _mk(spark, [(11, 0, "Ann Lee", "NYC"), (12, 0, "Bob Roy", "LA"),
                        (13, 1, "Zz Top", "Reno")])
    # with 3 unique right rows the full-agreement weight is
    # (0.95*9/3)^2 = 8.1225 — set `upper` below that
    golden = linkage.er_resolve(left, right, block_on=["blk"],
                                fields=["name", "city"], m=0.95,
                                upper=8.0, lower=2.0)
    rows = sorted(golden.collect(), key=lambda r: r.cluster_id)
    assert [(r.n_members, r.name, r.city) for r in rows] == [
        (2, "Ann Lee", "NYC"), (2, "Bob Roy", "LA")]
