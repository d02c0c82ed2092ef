from mismo_spark.linker.key import KeyLinker, key_counts, pair_counts
from mismo_spark.linker.basic import FullLinker, EmptyLinker
from mismo_spark.linker.join import JoinLinker, SlowJoinError, check_join_plan
from mismo_spark.linker.or_ import OrLinker
from mismo_spark.linker.unnest import UnnestLinker
from mismo_spark.linker.lsh import MinhashLshLinker, minhash_lsh_keys

__all__ = [
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
]
