from mismo_spark.types.linkage import Linkage
from mismo_spark.types.linked_table import (
    with_linked_values,
    with_n_links,
    link_counts,
)

__all__ = ["Linkage", "with_linked_values", "with_n_links", "link_counts"]
