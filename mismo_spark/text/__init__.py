from mismo_spark.text.strings import norm_whitespace, strip_accents
from mismo_spark.text.features import tokenize, ngrams
from mismo_spark.text.similarity import (
    levenshtein_ratio,
    damerau_levenshtein,
    damerau_levenshtein_ratio,
    jaro_similarity,
    jaro_winkler_similarity,
)

__all__ = [
    "norm_whitespace",
    "strip_accents",
    "tokenize",
    "ngrams",
    "levenshtein_ratio",
    "damerau_levenshtein",
    "damerau_levenshtein_ratio",
    "jaro_similarity",
    "jaro_winkler_similarity",
]
