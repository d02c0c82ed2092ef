"""MinhashLshLinker: deterministic minhash-LSH blocking.

The reference's LSH (mismo/linker/_lsh.py:17-99) hashes a *random
sample* of terms per band (non-deterministic ``array_choice``,
mismo/arrays/_array.py:159-167) and its linker ``__call__`` is
unfinished (mismo/linker/_lsh.py:96-98).  We implement the real thing:
proper seeded minhash — per hash function ``h_i(t) = xxhash64(t, seed_i)``,
signature = min over terms — grouped into bands, block where any band
key matches.  Same acceptance curve
``p_blocked(j) = 1 − (1 − j^band_size)^n_bands``
(mismo/linker/_lsh.py:101-102), but deterministic and reproducible
across runs and cluster sizes (required for the resume/byte-identity
gates).

Everything is JVM-side column algebra (higher-order ``transform`` +
``array_min`` + ``xxhash64``) inside whole-stage codegen — no Python.
The join shuffles on the band key; n_bands keys per record means
shuffle volume n_bands·|records|, independent of document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


def minhash_lsh_keys(
    terms: Column, *, band_size: int, n_bands: int, seed: int = 42
) -> Column:
    """array<int64> of n_bands LSH band keys for an array-of-terms column
    (deterministic re-derivation of mismo/linker/_lsh.py:17-43)."""
    def hash_fn(s: int):
        # NOTE: must be a 1-arg lambda — a 2-arg lambda would make
        # F.transform pass the ARRAY INDEX as the second argument,
        # silently collapsing every band to the same hash family.
        return lambda t: F.xxhash64(t, F.lit(s))

    band_keys = []
    for b in range(n_bands):
        mins = []
        for j in range(band_size):
            hseed = seed + b * band_size + j
            mins.append(F.array_min(F.transform(terms, hash_fn(hseed))))
        # fold the band's minhashes + band index into one 64-bit key
        band_keys.append(F.xxhash64(*mins, F.lit(b)))
    keys = F.array(*band_keys)
    # empty/null term sets produce no keys (never block)
    return F.when(F.size(terms) > 0, keys)


class MinhashLshLinker:
    """Block where any minhash band key matches."""

    def __init__(
        self,
        terms_column,
        *,
        band_size: int = 5,
        n_bands: int = 20,
        seed: int = 42,
        task: str | None = None,
    ) -> None:
        self.terms_column = terms_column
        self.band_size = band_size
        self.n_bands = n_bands
        self.seed = seed
        self.task = task

    def keys_for(self, df: DataFrame) -> Column:
        return minhash_lsh_keys(
            bind_one(df, self.terms_column),
            band_size=self.band_size,
            n_bands=self.n_bands,
            seed=self.seed,
        )

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        task = infer_task(left, right, self.task)

        def exploded(df: DataFrame) -> DataFrame:
            # IDENTICAL plan shape for both sides of a self-join: Spark's
            # ReusedExchange then computes the (expensive) minhash
            # projection + shuffle ONCE and feeds both join inputs.
            return df.select(
                F.col("record_id"),
                F.posexplode(self.keys_for(df)).alias("__band", "__key"),
            )

        if task == "dedupe" and left is right:
            keyed = exploded(left)
            lx = keyed.alias("l")
            rx = keyed.alias("r")
        else:
            lx = exploded(left).alias("l")
            rx = exploded(right).alias("r")
        pairs = lx.join(
            rx,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__key") == F.col("r.__key")),
            "inner",
        ).select(
            F.col("l.record_id").alias(ID_L), F.col("r.record_id").alias(ID_R)
        )
        if task == "dedupe":
            pairs = pairs.filter(F.col(ID_L) < F.col(ID_R))
        links = pairs.dropDuplicates([ID_L, ID_R])
        return Linkage(left=left, right=right, links=links)


def p_blocked(jaccard: float, *, band_size: int, n_bands: int) -> float:
    """Analytic acceptance probability (mismo/linker/_lsh.py:101-102)."""
    return 1.0 - (1.0 - jaccard**band_size) ** n_bands
