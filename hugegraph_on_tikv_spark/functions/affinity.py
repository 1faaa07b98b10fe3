"""Market-basket affinity: association rules over (basket, item) facts.

The classic co-occurrence analytics (support / confidence / lift) on top
of an order-lines table — the OLAP cousin of the co-purchase graph the
triangle family runs on.  Reference scope note: the reference engine
(hugegraph-on-tikv) exposes only scans/filters (TikvTable.java); this
module is north-star analytics built on the same table surface.

Scale shape: apriori-style frequent-item pruning FIRST (one aggregate +
semi-join), so the pair self-join runs only over items that can possibly
clear min_support; the join key is the basket id, whose fan-out is the
basket SIZE (single digits for order lines), never the item popularity —
a hot item cannot make the join quadratic.  All counts are exact
integers; the two ratios are single divisions rounded to 6dp, so every
row is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association(df: DataFrame, basket_col: str, item_col: str,
                     min_support: int = 2) -> DataFrame:
    """Association rules for unordered item PAIRS: for every pair
    (item_a < item_b) co-occurring in >= min_support distinct baskets,

    * n_a, n_b    — baskets containing each item,
    * n_ab        — baskets containing both,
    * confidence  — P(b in basket | a in basket) = n_ab / n_a,
    * lift        — n_ab·N / (n_a·n_b): >1 means the pair co-occurs more
      than independence predicts.

    Returns (item_a, item_b, n_a, n_b, n_ab, confidence, lift)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    facts = (df.select(F.col(basket_col).alias("_basket"),
                       F.col(item_col).alias("_item"))
             .distinct())
    n_total = facts.select("_basket").distinct().count()
    item_n = (facts.groupBy("_item")
              .agg(F.count(F.lit(1)).alias("_n")))
    # apriori prune: a pair cannot reach min_support unless both items do
    frequent = item_n.filter(F.col("_n") >= min_support)
    kept = facts.join(frequent.select("_item"), "_item", "left_semi")
    a = kept.select("_basket", F.col("_item").alias("item_a"))
    b = kept.select("_basket", F.col("_item").alias("item_b"))
    pair_n = (a.join(b, "_basket")
              .filter(F.col("item_a") < F.col("item_b"))
              .groupBy("item_a", "item_b")
              .agg(F.count(F.lit(1)).alias("n_ab"))
              .filter(F.col("n_ab") >= min_support))
    na = item_n.select(F.col("_item").alias("item_a"),
                       F.col("_n").alias("n_a"))
    nb = item_n.select(F.col("_item").alias("item_b"),
                       F.col("_n").alias("n_b"))
    return (pair_n.join(na, "item_a").join(nb, "item_b")
            .select("item_a", "item_b", "n_a", "n_b", "n_ab",
                    F.round(F.col("n_ab") / F.col("n_a"), 6)
                    .alias("confidence"),
                    F.round(F.col("n_ab") * F.lit(n_total)
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift")))
