"""mismo_spark — a from-scratch, PySpark-native record-linkage engine.

Re-derives the query semantics of NickCrews/mismo (blocking → pairwise
comparison → Fellegi-Sunter scoring → transitive clustering) expressed
Spark-first: declarative DataFrame plans optimized by Catalyst, Arrow
pandas UDFs only where built-ins cannot express the semantics, explicit
skew handling, and per-stage parquet checkpoints for resumability.

This is NOT a port of mismo (an Ibis/DuckDB expression library); it is a
new engine with the same observable semantics, designed for a
multi-executor cluster at web scale.  Reference files are cited in
docstrings as ``mismo/<path>:<line>`` for parity checking only.
"""

from mismo_spark.session import get_spark
from mismo_spark.exceptions import (
    MismoError,
    MismoWarning,
    SlowJoinWarning,
    UnsupportedBackendError,
)
from mismo_spark.types.linkage import Linkage
from mismo_spark.types.counts_table import (
    CountsTable,
    KeyCountsTable,
    LinkCountsTable,
    PairCountsTable,
)
from mismo_spark.linker.key import KeyLinker, key_counts, pair_counts
from mismo_spark.linker.basic import FullLinker, EmptyLinker
from mismo_spark.linker.join import JoinLinker, SlowJoinError, check_join_plan
from mismo_spark.linker.or_ import OrLinker
from mismo_spark.linker.unnest import UnnestLinker
from mismo_spark.linker.lsh import MinhashLshLinker, minhash_lsh_keys
from mismo_spark.compare.enum import EnumComparer, LevelCase
from mismo_spark.fs.weights import LevelWeights, ComparerWeights, Weights
from mismo_spark.fs.train import train_using_labels, train_using_pairs, level_proportions
from mismo_spark.fs.em import train_using_em
from mismo_spark.cluster.cc import connected_components
from mismo_spark.cluster.metrics import degree, pairwise_prf

__all__ = [
    "get_spark",
    "MismoError",
    "MismoWarning",
    "SlowJoinWarning",
    "UnsupportedBackendError",
    "CountsTable",
    "KeyCountsTable",
    "LinkCountsTable",
    "PairCountsTable",
    "Linkage",
    "KeyLinker",
    "key_counts",
    "pair_counts",
    "FullLinker",
    "EmptyLinker",
    "JoinLinker",
    "SlowJoinError",
    "check_join_plan",
    "OrLinker",
    "UnnestLinker",
    "MinhashLshLinker",
    "minhash_lsh_keys",
    "EnumComparer",
    "LevelCase",
    "LevelWeights",
    "ComparerWeights",
    "Weights",
    "train_using_labels",
    "train_using_pairs",
    "level_proportions",
    "train_using_em",
    "connected_components",
    "degree",
    "pairwise_prf",
]

__version__ = "0.1.0"
