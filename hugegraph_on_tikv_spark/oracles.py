"""DuckDB oracle-SQL builders.

The driver's correctness gate runs each `queries()` entry in Spark and the
matching `oracle_sql()` string in DuckDB over the same parquet views, then
compares row count + schema + order-insensitive value hash.  This module
generates the shared SQL fragments — most importantly the graph-view CTEs,
generated from the SAME specs (sources/graph.py VERTEX_SPECS/EDGE_SPECS) the
Spark DataFrames are built from, so view and oracle cannot drift.

Portable-hash contract (functions/hashing.py): h60(x) = first 15 hex chars of
md5 as BIGINT; h48(x) = first 12.  Keep these in lockstep with the Spark
expressions.
"""

from __future__ import annotations

from hugegraph_on_tikv_spark.functions.hashing import MINHASH_P, minhash_seed
from hugegraph_on_tikv_spark.sources.graph import (
    EDGE_PROP_COLUMNS,
    EDGE_SPECS,
    ID_BASE,
    LABEL_CODES,
    VERTEX_PROP_COLUMNS,
    VERTEX_SPECS,
)

_DUCK_TYPES = {
    "string": "VARCHAR",
    "double": "DOUBLE",
    "int": "INTEGER",
    "long": "BIGINT",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def encode_id_sql(label: str, key_expr: str) -> str:
    return f"({LABEL_CODES[label]} * {ID_BASE} + CAST({key_expr} AS BIGINT))"


def _vertex_select(label: str, table: str, key: str, props: dict[str, str]) -> str:
    cols = [f"{encode_id_sql(label, key)} AS id", f"'{label}' AS label"]
    for name, typ in VERTEX_PROP_COLUMNS:
        src = props.get(name)
        duck_t = _DUCK_TYPES[typ]
        expr = f"CAST({src} AS {duck_t})" if src else f"CAST(NULL AS {duck_t})"
        cols.append(f'{expr} AS "{name}"')
    return f"SELECT {', '.join(cols)} FROM {table}"


def _edge_select(label: str, table: str, src: tuple[str, str], dst: tuple[str, str],
                 props: dict[str, str], distinct: bool) -> str:
    sl, sc = src
    dl, dc = dst
    source = f"(SELECT DISTINCT {sc}, {dc} FROM {table})" if distinct else table
    cols = [
        f"{encode_id_sql(sl, sc)} AS src",
        f"{encode_id_sql(dl, dc)} AS dst",
        f"'{label}' AS label",
    ]
    for name, typ in EDGE_PROP_COLUMNS:
        s = props.get(name)
        duck_t = _DUCK_TYPES[typ]
        expr = f"CAST({s} AS {duck_t})" if s else f"CAST(NULL AS {duck_t})"
        cols.append(f'{expr} AS "{name}"')
    return f"SELECT {', '.join(cols)} FROM {source}"


def vertices_sql() -> str:
    return "\nUNION ALL\n".join(_vertex_select(l, t, k, p) for l, t, k, p in VERTEX_SPECS)


def edges_sql() -> str:
    return "\nUNION ALL\n".join(_edge_select(*spec) for spec in EDGE_SPECS)


def graph_ctes() -> str:
    """`WITH`-clause body declaring vertices + edges; prepend to graph
    oracles.  MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
    reference, so iterative oracles (pagerank/CC unrollings) that reference a
    CTE twice per round would re-expand the whole view exponentially."""
    return (
        f"vertices AS MATERIALIZED (\n{vertices_sql()}\n), "
        f"edges AS MATERIALIZED (\n{edges_sql()}\n)"
    )


# -- text helpers ------------------------------------------------------------

TOKENS_SQL = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
NORM_SQL = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
FINGERPRINT_SQL = f"md5({NORM_SQL})"

# portable hashes — MUST match functions/hashing.py
H60_SQL = "CAST(CAST(('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)"
H48_SQL = "CAST(CAST(('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 12)) AS UBIGINT) AS BIGINT)"


def minhash_seeds_values() -> str:
    """VALUES list (i, a, b) for the minhash permutations."""
    rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in
                     ((i, minhash_seed(i)) for i in range(32)))
    return f"(VALUES {rows}) AS seeds(i, a, b)"


def word_shingles_sql(tokens_expr: str, k: int = 3) -> str:
    """k-word shingles (list<varchar>) from a token-list expression; mirrors
    functions/dedup.word_shingles (sequence is empty when fewer than k
    tokens)."""
    return (
        f"list_transform(range(1, greatest(len({tokens_expr}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string({tokens_expr}[i:i+{k - 1}], ' '))"
    )


MINHASH_P_SQL = str(MINHASH_P)
