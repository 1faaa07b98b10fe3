from hugegraph_on_tikv_spark.plans.ir import (
    Aggregate,
    Condition,
    ConditionQuery,
    IdPrefixQuery,
    IdQuery,
    IdRangeQuery,
    Op,
    Query,
    ScanType,
    Shard,
)
from hugegraph_on_tikv_spark.plans.engine import NotSupportedError, QueryEngine

__all__ = [
    "Aggregate",
    "Condition",
    "ConditionQuery",
    "IdPrefixQuery",
    "IdQuery",
    "IdRangeQuery",
    "Op",
    "Query",
    "ScanType",
    "Shard",
    "NotSupportedError",
    "QueryEngine",
]
