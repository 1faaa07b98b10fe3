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
