from hugegraph_on_tikv_spark.functions import dedup, hashing, multimodal, similarity, text

__all__ = ["dedup", "hashing", "multimodal", "similarity", "text"]
