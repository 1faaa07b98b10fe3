"""hugegraph_on_tikv_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of tidb-incubator/hugegraph-on-tikv.

The reference (read-only at /root/reference/) is a HugeGraph storage backend
on TiKV: a property-graph data model (schema + 7 index families) served
through the HugeGraph backend-store SPI (point/prefix/range/condition scans,
COUNT, paging, TTL, sharded parallel scan, batched mutations).  This package
re-expresses those capabilities Spark-first — DataFrame/SQL plans optimized
by Catalyst — plus graph analytics and LLM-data-pipeline operators designed
for 100 TB scale.

Layout:
  sources/    fixture catalog + property-graph store (vertices/edges views)
  plans/      the Query IR mirroring the reference's query classes + compiler
  operators/  scans, mutations, indexes, traversal, analytics
  functions/  text analysis, dedup, similarity, multimodal
  streaming/  structured-streaming windows/watermarks
"""

from hugegraph_on_tikv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
