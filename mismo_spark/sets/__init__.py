from mismo_spark.sets.compare import jaccard
from mismo_spark.sets.tfidf import (
    document_counts,
    term_idf,
    add_array_value_counts,
    add_tfidf,
    rare_terms,
)

__all__ = [
    "jaccard",
    "document_counts",
    "term_idf",
    "add_array_value_counts",
    "add_tfidf",
    "rare_terms",
]
