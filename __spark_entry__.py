"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship 2-hop traversal (smoke check); `queries()`
exposes one named DataFrame-producing callable per implemented operator from
SURVEY.md §2 (+ north-star extensions); `oracle_sql()` gives the equivalent
DuckDB SQL over the same parquet views.  Column names and value determinism
rules:

* every computed column is aliased identically on both sides;
* money aggregates are summed as DECIMAL(18,2) then cast to DOUBLE — exact
  and summation-order-independent in both engines (double-sums differ in the
  last bits between engines and can flip rounded values);
* all hashes feeding results are md5-derived (portable bit-identically);
* timestamps in outputs are formatted to 'yyyy-MM-dd HH:mm:ss' strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hugegraph_on_tikv_spark.operators import analytics, indexes, traversal
from hugegraph_on_tikv_spark.oracles import graph_ctes
from hugegraph_on_tikv_spark.plans import (
    Condition,
    ConditionQuery,
    IdPrefixQuery,
    IdQuery,
    IdRangeQuery,
    Op,
    Query,
    QueryEngine,
    Shard,
)
from hugegraph_on_tikv_spark.plans.engine import encode_page
from hugegraph_on_tikv_spark.sources.catalog import load_events, load_table
from hugegraph_on_tikv_spark.sources.graph import GraphStore, ID_BASE, LABEL_CODES
from hugegraph_on_tikv_spark.streaming import windows


def _vid(label: str, key: int) -> int:
    return LABEL_CODES[label] * ID_BASE + key


def _money(col):
    """Deterministic sum of a 2-dp money column: DECIMAL sum → DOUBLE."""
    return F.sum(col.cast("decimal(18,2)")).cast("double")


_FMT = "yyyy-MM-dd HH:mm:ss"


def _ts(col):
    return F.date_format(col, _FMT)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per market segment, the number + value of lineitem edges
    reachable customer→placed→order→contains — a 2-hop traversal with filter
    and aggregate (SURVEY.md §7 phase 0), all broadcast-friendly joins."""
    g = GraphStore(spark, "/root/testdata/sf0.001")
    v, e = g.vertices(), g.edges()
    customers = v.filter(F.col("label") == "customer").select("id", "mktsegment")
    placed = e.filter(F.col("label") == "placed").select("src", F.col("dst").alias("order_id"))
    contains = e.filter(F.col("label") == "contains").select(
        F.col("src").alias("order_id"), "extendedprice"
    )
    return (
        customers.join(placed, customers.id == placed.src)
        .join(contains, "order_id")
        .groupBy("mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            _money(F.col("extendedprice")).alias("total_price"),
        )
        .orderBy("mktsegment")
    )


# ---------------------------------------------------------------------------
# queries + oracles (kept adjacent per entry so they cannot drift)
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None):
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# -- S1: full-table scan (TikvTable.java:191-200) ---------------------------

_register(
    "s1_scan_all",
    lambda spark, sf: QueryEngine(
        load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        key=["l_orderkey", "l_linenumber"],
    ).query(Query(table="lineitem")),
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)

# -- S2: point get (TikvTable.java:207-214, TikvTables.java:122-126) --------

_register(
    "s2_point_get",
    lambda spark, sf: QueryEngine(GraphStore(spark, sf).vertices()).query(
        IdQuery(table="vertices", ids=[_vid("customer", 42)])
    ).select("id", "label", "name", "mktsegment"),
    f"""
    WITH {graph_ctes()}
    SELECT id, label, name, mktsegment FROM vertices
    WHERE id = {_vid("customer", 42)}
    """,
)

# -- S5: multi-id lookup preserving input order (TikvTable.java:177-184,
#        TikvFeatures.java:61-64) -------------------------------------------

_S5_IDS = [_vid("customer", 5), _vid("part", 7), _vid("customer", 1), _vid("supplier", 3)]

def _s5(spark: SparkSession, sf: str) -> DataFrame:
    out = QueryEngine(GraphStore(spark, sf).vertices()).query(
        IdQuery(table="vertices", ids=_S5_IDS)
    )
    pos = F.array_position(F.array(*[F.lit(i) for i in _S5_IDS]), F.col("id"))
    return out.select("id", "label", "name", pos.cast("long").alias("input_pos"))

_register(
    "s5_multi_id_ordered",
    _s5,
    f"""
    WITH {graph_ctes()},
    wanted(id, input_pos) AS (VALUES {", ".join(f"({v}, {i + 1})" for i, v in enumerate(_S5_IDS))})
    SELECT v.id, v.label, v.name, CAST(w.input_pos AS BIGINT) AS input_pos
    FROM vertices v JOIN wanted w ON v.id = w.id
    """,
)

# -- S6: prefix scan with exclusive resume point (TikvTable.java:216-223) ---

_register(
    "s6_prefix_scan",
    lambda spark, sf: QueryEngine(load_table(spark, sf, "customer"), key="c_name").query(
        IdPrefixQuery(table="customer", prefix="Customer#00000012",
                      start="Customer#000000124", inclusive_start=False)
    ).select("c_custkey", "c_name"),
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_name LIKE 'Customer#00000012%' AND c_name > 'Customer#000000124'
    """,
)

# -- S7: range scan with per-bound inclusivity (TikvTable.java:225-236) -----

_register(
    "s7_range_scan",
    lambda spark, sf: QueryEngine(load_table(spark, sf, "orders"), key="o_orderkey").query(
        IdRangeQuery(table="orders", start=100, end=200,
                     inclusive_start=True, inclusive_end=False)
    ).select("o_orderkey", F.round(F.col("o_totalprice"), 2).alias("o_totalprice")),
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
    WHERE o_orderkey >= 100 AND o_orderkey < 200
    """,
)

# -- S8: shard scan (TikvTable.java:250-269) --------------------------------

_register(
    "s8_shard_scan",
    lambda spark, sf: QueryEngine(load_table(spark, sf, "orders"), key="o_orderkey").query(
        ConditionQuery(table="orders", shard=Shard(start=500, end=600))
    ).select("o_orderkey", "o_custkey"),
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 600",
)

# -- F5: limit-0 short-circuit (TikvTable.java:151-157) ---------------------

_register(
    "f5_limit0",
    lambda spark, sf: QueryEngine(
        load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber"),
        key=["l_orderkey", "l_linenumber"],
    ).query(Query(table="lineitem", limit=0)),
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE FALSE",
)

# -- S9/S11 + F4: condition query with range/IN/prefix relations ------------

_register(
    "s11_condition_query",
    lambda spark, sf: QueryEngine(load_table(spark, sf, "part"), key="p_partkey").query(
        ConditionQuery(
            table="part",
            conditions=[
                Condition("p_size", Op.GTE, 10),
                Condition("p_size", Op.LT, 20),
                Condition("p_brand", Op.IN, ["Brand#1", "Brand#2"]),
                Condition("p_type", Op.PREFIX, "ECO"),
            ],
        )
    ).select("p_partkey", "p_brand", "p_type", "p_size"),
    """
    SELECT p_partkey, p_brand, p_type, p_size FROM part
    WHERE p_size >= 10 AND p_size < 20
      AND p_brand IN ('Brand#1', 'Brand#2') AND p_type LIKE 'ECO%'
    """,
)

# -- paging: keyset cursor resume (TikvStdSessions.java:687-689,
#            TikvTable.java:192-196) ----------------------------------------

_PAGE = encode_page([1000, 3])

_register(
    "paging_keyset",
    lambda spark, sf: QueryEngine(
        load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        key=["l_orderkey", "l_linenumber"],
    ).query(Query(table="lineitem", page=_PAGE, limit=100)),
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_orderkey > 1000 OR (l_orderkey = 1000 AND l_linenumber > 3)
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
)

# -- A1: COUNT aggregate (TikvTable.java:134-148) ---------------------------

_register(
    "a1_count",
    lambda spark, sf: QueryEngine(load_table(spark, sf, "lineitem")).query(
        ConditionQuery(table="lineitem", conditions=[Condition("l_returnflag", Op.EQ, "R")])
    ).agg(F.count(F.lit(1)).alias("n")),
    "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem WHERE l_returnflag = 'R'",
)

# -- TPC-H-style headliners (extended aggregates; the reference pushes none
#    of these down — supportsAggregateProperty=false, TikvFeatures:118-121 —
#    our engine computes them natively) -------------------------------------

def _q1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            _money(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

_register(
    "q1_pricing_summary",
    _q1,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_disc_price,
           round(AVG(l_quantity), 4) AS avg_qty,
           round(AVG(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)


def _q3(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", F.col("revenue"), _ts("o_orderdate").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )

_register(
    "q3_shipping_priority",
    _q3,
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)

# -- graph analytics --------------------------------------------------------

_register(
    "g_degree",
    lambda spark, sf: analytics.degrees(GraphStore(spark, sf).edges()),
    f"""
    WITH {graph_ctes()},
    endpoints AS (
      SELECT src AS id, 1 AS is_out, 0 AS is_in FROM edges
      UNION ALL
      SELECT dst AS id, 0 AS is_out, 1 AS is_in FROM edges
    )
    SELECT id, CAST(SUM(is_out) AS BIGINT) AS out_degree,
           CAST(SUM(is_in) AS BIGINT) AS in_degree,
           CAST(count(*) AS BIGINT) AS degree
    FROM endpoints GROUP BY id
    """,
)

_KHOP_START = _vid("customer", 42)

_register(
    "g_khop2",
    lambda spark, sf: traversal.k_hop(
        GraphStore(spark, sf).edges(), [_KHOP_START], k=2, direction=traversal.OUT
    ),
    f"""
    WITH {graph_ctes()},
    l1 AS (SELECT DISTINCT dst AS id FROM edges WHERE src = {_KHOP_START}),
    l2 AS (
      SELECT DISTINCT e.dst AS id FROM edges e JOIN l1 ON e.src = l1.id
      WHERE e.dst NOT IN (SELECT id FROM l1) AND e.dst <> {_KHOP_START}
    )
    SELECT id, CAST(1 AS INTEGER) AS hops FROM l1
    UNION ALL
    SELECT id, CAST(2 AS INTEGER) AS hops FROM l2
    """,
)

# -- streaming-shaped windows (batch twins; SURVEY.md §2.9) -----------------

_register(
    "win_tumbling",
    lambda spark, sf: windows.tumbling_counts(load_events(spark, sf), "1 hour")
    .select(_ts("window_start").alias("window_start"), "event_type", "n_events", "sum_value"),
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
