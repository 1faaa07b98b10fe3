"""Index families (SURVEY.md §1.2): the 7 index-table kinds re-expressed.

The reference materializes indexes as KV tables — secondary
(TikvTables.java:176-183), vertex/edge label (TikvTables.java:185-201),
typed range int/float/long/double (TikvTables.java:282-316), search
(TikvTables.java:203-210), shard composite prefix+range
(TikvTables.java:318-325), unique (TikvTables.java:212-219) — because a KV
store can only prefix/range-scan keys.  Range conditions compile relations
PREFIX/GT/GTE/LT/LTE into byte ranges with exclusive-min via byte-successor
(TikvTables.java:242-278).

In Spark, parquet min/max stats + predicate pushdown give range-index
behavior for free, so materialized indexes are a *choice*, not a necessity.
We provide both paths:

* direct:  plain Catalyst filters on the element table (the default — this
  is what survives a 100x scale-up best, since it reads one table with
  pushdown instead of an index join);
* materialized:  `(value..., element_id)` DataFrames mirroring the
  reference's tables, useful when the index is much smaller than the data
  (e.g. an inverted text index) — queried via broadcast semi-join back to
  the element table.

Byte-order tricks (increaseOne successor for exclusive bounds, LTE
prefix-truncation F2) are re-expressed as value-level predicates.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


# -- index builders (the materialized path) ---------------------------------

def secondary_index(df: DataFrame, prop: str, id_col: str = "id") -> DataFrame:
    """Exact-match property → element ids (TikvTables.java:176-183)."""
    return df.select(F.col(prop).alias("field_value"), F.col(id_col).alias("element_id"))


def label_index(df: DataFrame, label_col: str = "label", id_col: str = "id") -> DataFrame:
    """Label → element ids (TikvTables.java:185-201).  In Spark the better
    physical analog is partitioning the element table by label."""
    return df.select(F.col(label_col).alias("label"), F.col(id_col).alias("element_id"))


def range_index(df: DataFrame, prop: str, id_col: str = "id") -> DataFrame:
    """Typed numeric property → element ids (TikvTables.java:282-316).  One
    builder serves int/float/long/double — Spark columns are typed already,
    so the reference's four per-type tables collapse into one shape."""
    return df.select(F.col(prop).alias("field_value"), F.col(id_col).alias("element_id"))


def search_index(df: DataFrame, text_col: str, id_col: str = "id") -> DataFrame:
    """Full-text token inverted index (TikvTables.java:203-210; tokenization
    happens upstream in the reference — here it's explicit)."""
    tokens = F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_PATTERN), "")
    return (
        df.select(F.explode(tokens).alias("token"), F.col(id_col).alias("element_id"))
        .distinct()
    )


def shard_index(df: DataFrame, prefix_props: Sequence[str], range_prop: str,
                id_col: str = "id") -> DataFrame:
    """Composite prefix+range index (TikvTables.java:318-325)."""
    cols = [F.col(p) for p in prefix_props]
    return df.select(*cols, F.col(range_prop).alias("range_value"), F.col(id_col).alias("element_id"))


# -- queries over indexes ----------------------------------------------------

def range_query(index: DataFrame, lo: Any = None, hi: Any = None,
                inclusive_lo: bool = True, inclusive_hi: bool = True) -> DataFrame:
    """Range-relation compilation (F4, TikvTables.java:242-278): exclusive
    bounds use value-level strict comparison instead of byte successors."""
    v = F.col("field_value")
    out = index
    if lo is not None:
        out = out.filter(v >= lo if inclusive_lo else v > lo)
    if hi is not None:
        out = out.filter(v <= hi if inclusive_hi else v < hi)
    return out


def search_query(index: DataFrame, query_text: str) -> DataFrame:
    """Match elements containing ANY query token; ranked by match count."""
    tokens = [t for t in re.split(TOKEN_PATTERN, query_text.lower()) if t]
    return (
        index.filter(F.col("token").isin(tokens))
        .groupBy("element_id")
        .agg(F.countDistinct("token").alias("matched_tokens"))
    )


def unique_check(df: DataFrame, props: Sequence[str]) -> DataFrame:
    """Unique-index enforcement (TikvTables.java:212-219): returns violating
    value groups (empty DataFrame = constraint holds).  Run before commit."""
    return (
        df.groupBy(*[F.col(p) for p in props])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def lookup_elements(index_hits: DataFrame, elements: DataFrame,
                    id_col: str = "id") -> DataFrame:
    """Index hits → element rows.  Broadcast the (small) hit set so the big
    element scan never shuffles."""
    hits = F.broadcast(index_hits.select(F.col("element_id").alias(id_col)).distinct())
    return elements.join(hits, on=id_col, how="inner")
