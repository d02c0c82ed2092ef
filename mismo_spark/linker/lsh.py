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
        hasher: str = "xxhash64",
    ) -> None:
        """``hasher``: ``"xxhash64"`` (default, JVM builtin, fastest) or
        ``"md5"`` — minhash over the lexicographic order of md5 hex
        digests ``md5(term || ':' || hash_index)``.  md5 is slower but
        byte-identical to ANSI-SQL ``md5()``, so md5-mode blocking is
        independently verifiable by the DuckDB oracle harness (the
        minhash property only needs a uniform hash order; lexicographic
        order on hex digests qualifies)."""
        if hasher not in ("xxhash64", "md5"):
            raise ValueError(f"unknown hasher {hasher!r}")
        self.terms_column = terms_column
        self.band_size = band_size
        self.n_bands = n_bands
        self.seed = seed
        self.task = task
        self.hasher = hasher

    def _hash(self, term: Column, i: int) -> Column:
        if self.hasher == "xxhash64":
            return F.xxhash64(term, F.lit(self.seed + i))
        return F.md5(F.concat(term, F.lit(f":{self.seed + i}")))

    def keys_for(self, df: DataFrame) -> Column:
        terms = bind_one(df, self.terms_column)
        if self.hasher == "xxhash64":
            return minhash_lsh_keys(
                terms,
                band_size=self.band_size,
                n_bands=self.n_bands,
                seed=self.seed,
            )
        # md5 mode: band key = '|'-joined per-hash minima (array<string>)
        band_keys = []
        for b in range(self.n_bands):
            mins = [
                F.array_min(
                    F.transform(
                        terms,
                        (lambda idx: lambda t: self._hash(t, idx))(
                            b * self.band_size + j
                        ),
                    )
                )
                for j in range(self.band_size)
            ]
            band_keys.append(F.concat_ws("|", *mins))
        return F.when(F.size(terms) > 0, F.array(*band_keys))

    def _banded(self, df: DataFrame) -> DataFrame:
        """(record_id, __band, __key) via explode → groupBy-min.

        Same keys as ``keys_for`` (identical hash formula), but as a
        hash-aggregation plan instead of 64 higher-order ``transform``
        lambdas: the lambdas run on Spark's interpreted expression path
        and their huge combined projection is slow to codegen-compile —
        both serial costs that cap scaling.  Here every operator
        (explode, xxhash64-of-long, min-aggregate) is whole-stage
        codegen, and map-side partial aggregation collapses each
        record's terms before the shuffle, so shuffle volume is
        |records|·n_hashes·8B regardless of document size."""
        n_hashes = self.band_size * self.n_bands
        ex = df.select(
            "record_id", F.explode(bind_one(df, self.terms_column)).alias("__t")
        )
        mins = ex.groupBy("record_id").agg(
            *[
                F.min(self._hash(F.col("__t"), i)).alias(f"__m{i}")
                for i in range(n_hashes)
            ]
        )
        if self.hasher == "xxhash64":
            bands = [
                F.xxhash64(
                    *[
                        F.col(f"__m{b * self.band_size + j}")
                        for j in range(self.band_size)
                    ],
                    F.lit(b),
                )
                for b in range(self.n_bands)
            ]
        else:
            bands = [
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"__m{b * self.band_size + j}")
                        for j in range(self.band_size)
                    ],
                )
                for b in range(self.n_bands)
            ]
        return mins.select(
            "record_id", F.posexplode(F.array(*bands)).alias("__band", "__key")
        )

    def raw_pairs(self, left: DataFrame, right: DataFrame | None = None) -> DataFrame:
        """Candidate pairs BEFORE the final distinct — a pair appears
        once per matching band.  Composition hook for OrLinker: it
        dedupes the union of all its rules anyway, so deduping here too
        would shuffle the full pair set twice back-to-back."""
        if right is None:
            right = left
        task = infer_task(left, right, self.task)

        if task == "dedupe":
            # Bucket-combination plan: group the banded rows by bucket,
            # sort each bucket's ids, emit the i<j combinations.  Same
            # pair set as a band self-join + `id_l < id_r` filter, but
            # ONE hash aggregation instead of a sort-merge self-join:
            # the 2 per-side sorts disappear, the banded exchange is
            # read once not twice, and the Σn² self-matches / reversed
            # duplicates are never materialized (measured: the SMJ
            # emitted 16.8M raw rows for 3.85M kept pairs at 283k docs).
            # The quadratic blowup inside one giant bucket is the SAME
            # as the join's (Σ n_b²) — huge-bucket corpora need a
            # semantic cap either way (cf. KeyLinker.max_pairs).
            keyed = self._banded(left)
            # xxhash64 band keys already fold the band index into the
            # 64-bit key (`xxhash64(*mins, lit(b))`); md5 keys are raw
            # digest concatenations, so they need the band column to
            # disambiguate equal digests across bands.
            group_cols = ["__key"] if self.hasher == "xxhash64" else ["__band", "__key"]
            buckets = (
                keyed.groupBy(*group_cols)
                .agg(F.sort_array(F.collect_list("record_id")).alias("__ids"))
                .filter(F.size("__ids") >= 2)
            )
            # 2-arg transform lambda receives (element, 0-based index):
            # pair each id with every LATER id in the sorted bucket
            ids = F.col("__ids")
            combos = F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + F.lit(2), F.size(ids) - i - F.lit(1)),
                        lambda y: F.struct(x.alias("l"), y.alias("r")),
                    ),
                )
            )
            pairs = buckets.select(F.explode(combos).alias("__p")).select(
                F.col("__p.l").alias(ID_L), F.col("__p.r").alias(ID_R)
            )
        else:
            lx = self._banded(left).alias("l")
            rx = self._banded(right).alias("r")
            pairs = lx.join(
                rx,
                (F.col("l.__band") == F.col("r.__band"))
                & (F.col("l.__key") == F.col("r.__key")),
                "inner",
            ).select(
                F.col("l.record_id").alias(ID_L), F.col("r.record_id").alias(ID_R)
            )
        return pairs

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        links = self.raw_pairs(left, right).dropDuplicates([ID_L, ID_R])
        return Linkage(left=left, right=right, links=links)


def p_blocked(jaccard: float, *, band_size: int, n_bands: int) -> float:
    """Analytic acceptance probability (mismo/linker/_lsh.py:101-102)."""
    return 1.0 - (1.0 - jaccard**band_size) ** n_bands
