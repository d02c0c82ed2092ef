from mismo_spark.cluster.cc import connected_components
from mismo_spark.cluster.metrics import degree, pairwise_prf

__all__ = ["connected_components", "degree", "pairwise_prf"]
