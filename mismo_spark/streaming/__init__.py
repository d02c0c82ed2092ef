from mismo_spark.streaming.cluster_maint import (
    incremental_cluster_stream,
    read_assignments,
)
from mismo_spark.streaming.incremental import incremental_link_stream

__all__ = [
    "incremental_cluster_stream",
    "incremental_link_stream",
    "read_assignments",
]
