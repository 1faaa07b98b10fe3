from hugegraph_on_tikv_spark.sources.catalog import TABLES, load_table, load_tables
from hugegraph_on_tikv_spark.sources.graph import GraphStore

__all__ = ["TABLES", "load_table", "load_tables", "GraphStore"]
