from hugegraph_on_tikv_spark.streaming import windows

__all__ = ["windows"]
