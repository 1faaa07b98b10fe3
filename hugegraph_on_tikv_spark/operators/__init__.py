from hugegraph_on_tikv_spark.operators.mutations import MutationBatch, TableState
from hugegraph_on_tikv_spark.operators.traversal import k_hop, neighbors
from hugegraph_on_tikv_spark.operators import analytics, indexes

__all__ = ["MutationBatch", "TableState", "k_hop", "neighbors", "analytics", "indexes"]
