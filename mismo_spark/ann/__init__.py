"""Similarity search over embedding columns (array<float>).

Two paths:
* ``cosine_topk`` — brute-force exact top-k: the query matrix is
  collected driver-side (small by design) and closed over by ONE
  Arrow ``mapInPandas`` pass that scores each corpus batch with a
  numpy matmul and keeps a per-partition top-k, so the corpus is
  scanned once and only ``n_partitions × |queries| × k`` candidate
  rows reach the final global window.  The correctness baseline.
* ``lsh_cosine_topk`` — random-hyperplane (signed projection) LSH
  bucketing: candidates share at least one band bucket, then exact
  re-rank within candidates.  The scale path: shuffle is
  |corpus|·n_bands (id, bucket) rows instead of |corpus|·|queries|.

Hyperplanes are generated from a seeded RNG on the driver and closed
over by one Arrow pandas UDF (numpy matmul per batch) — deterministic
everywhere, replayable by the DuckDB oracle from the same seed.

Numeric notes (oracle parity): all exact-cosine scoring happens in
float64; numpy's batched summation and DuckDB's sequential
``list_dot_product`` differ at ~1e-15 relative on dim-64 vectors, far
inside the harness' 6-decimal rounding.  One deliberate deviation from
the old higher-order-function scorer: a zero-norm vector now yields a
NULL cosine instead of NaN (Arrow's pandas bridge uses NaN as the null
sentinel for float columns), which ranks LAST under ``F.desc`` instead
of first; no shipped dataset contains zero/null vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _cosine(a: Column, b: Column) -> Column:
    """Exact cosine as pure column algebra (higher-order functions).

    One-off/small-input form: HOF projections run on Spark's
    interpreted expression path (they fall off whole-stage codegen), so
    per-pair throughput caps around ~10k pairs/s/core.  Hot paths use
    :func:`cosine_pairs` (Arrow-batched numpy, ~100× faster); this stays
    as the dependency-free reference implementation."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    denom = na * nb
    return F.when(denom == 0, F.lit(float("nan"))).otherwise(dot / denom)


def cosine_pairs(a: Column, b: Column) -> Column:
    """Vectorized exact cosine of two ``array<double>`` columns: one
    Arrow pandas UDF doing batched numpy row-wise dot products.

    This is the hot-path pair scorer (candidate rechecks in
    ``embedding_near_duplicates`` / ``lsh_cosine_topk`` / IVF): the
    interpreted-HOF :func:`_cosine` was measured at ~14k pairs/s on 32
    cores — the numpy path does the same work in milliseconds per
    batch.  Zero-norm or null inputs yield NULL (see module docstring).
    """

    @F.pandas_udf(DoubleType())
    def _cp(pa: pd.Series, pb: pd.Series) -> pd.Series:
        n = len(pa)
        out = np.full(n, np.nan)
        av = pa.to_numpy()
        bv = pb.to_numpy()
        valid = np.array(
            [x is not None and y is not None for x, y in zip(av, bv)], dtype=bool
        )
        if valid.any():
            A = np.stack(av[valid]).astype(np.float64)
            B = np.stack(bv[valid]).astype(np.float64)
            dots = np.einsum("ij,ij->i", A, B)
            na = np.sqrt(np.einsum("ij,ij->i", A, A))
            nb = np.sqrt(np.einsum("ij,ij->i", B, B))
            denom = na * nb
            with np.errstate(invalid="ignore", divide="ignore"):
                c = np.where(denom == 0, np.nan, dots / denom)
            out[valid] = c
        return pd.Series(out)

    return _cp(a.cast("array<double>"), b.cast("array<double>"))


def _topk_pdf(nids, keys, cosines, k: int) -> pd.DataFrame:
    """Exact top-k of one query's candidates: sort by (key desc,
    neighbour_id asc) with a stable mergesort — ties at the k boundary
    resolve by id, matching the SQL window's ORDER BY exactly."""
    d = pd.DataFrame({"neighbour_id": nids, "__key": keys, "cosine": cosines})
    d = d.sort_values(
        ["__key", "neighbour_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return d.drop(columns="__key")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    → (query_id, neighbour_id, cosine) with ≤ k neighbours per query
    (self-matches excluded).  The queries (small by design — this is
    the broadcast side) are collected to the driver ONCE as an L2-norm
    numpy matrix and closed over by a ``mapInPandas`` scorer: each
    corpus batch is scored with a single float64 matmul
    (batch × queriesᵀ), whole batches at a time, and each partition
    emits only its per-query top-k — so the shuffle into the final
    global window moves ``n_partitions × |queries| × k`` rows, never
    the |corpus| × |queries| cross product.  The corpus is scanned
    once, fully parallel, no corpus shuffle before the k-row-per-query
    window."""
    q_rows = queries.select(id_column, vec_column).collect()
    q_rows = [r for r in q_rows if r[1] is not None]
    qid_type = queries.schema[id_column].dataType
    nid_type = corpus.schema[id_column].dataType
    schema = StructType(
        [
            StructField("query_id", qid_type),
            StructField("neighbour_id", nid_type),
            StructField("cosine", DoubleType()),
        ]
    )
    spark = corpus.sparkSession
    if not q_rows:
        return spark.createDataFrame([], schema)
    q_ids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    nq = len(q_ids)

    def _score(batches):
        per_q: list[list[pd.DataFrame]] = [[] for _ in range(nq)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf["__cv"].to_numpy()
            nids = pdf["neighbour_id"].to_numpy()
            valid = np.array([x is not None for x in vals], dtype=bool)
            if not valid.any():
                continue
            C = np.stack(vals[valid]).astype(np.float64)
            nv = nids[valid]
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            dots = C @ Q.T
            denom = cn[:, None] * qn[None, :]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(denom == 0, np.nan, dots / denom)
            for j in range(nq):
                mask = nv != q_ids[j]
                cj = cos[mask, j]
                # NaN (zero-norm) ranks last, like NULL under F.desc
                key = np.where(np.isnan(cj), -np.inf, cj)
                per_q[j].append(_topk_pdf(nv[mask], key, cj, k))
        outs = []
        for j in range(nq):
            if not per_q[j]:
                continue
            merged = pd.concat(per_q[j], ignore_index=True)
            key = np.where(np.isnan(merged["cosine"]), -np.inf, merged["cosine"])
            top = _topk_pdf(merged["neighbour_id"], key, merged["cosine"], k)
            top.insert(0, "query_id", q_ids[j])
            outs.append(top)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    c = corpus.select(
        F.col(id_column).alias("neighbour_id"),
        F.col(vec_column).cast("array<double>").alias("__cv"),
    )
    scored = c.mapInPandas(_score, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbour_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_buckets(
    vec_col: Column,
    *,
    dim: int,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
) -> Column:
    """array<long> of n_bands bucket keys: per band, ``band_bits`` sign
    bits of seeded random projections packed into an int, plus the band
    index in the high bits.

    Executed as ONE Arrow pandas UDF doing a fused numpy matmul
    (batch × hyperplanesᵀ).  A column-algebra unrolling of the
    n_bands·band_bits·dim dot-product terms was tried first and is a
    trap: the ~4096-node expression tree makes janino codegen fail
    (slowly) and the interpreted fallback does thousands of virtual
    calls per row — the matmul is 10-100× faster and one Arrow pass.
    Hyperplanes come from a seeded driver-side RNG closed over by the
    UDF (band-major draw order), so bucket values are deterministic and
    replayable in any engine (the DuckDB oracle rebuilds them as SQL
    literals from the same seed).

    Numeric fragility note: a sign bit is the sign of a float64 dot
    product, so a projection landing within ~1e-15 of zero could pack
    differently between numpy's (BLAS, pairwise) summation and an
    oracle's sequential fold.  With N(0,1) hyperplanes and O(1) vector
    entries the probability of a projection that close to zero is
    ~1e-15 per bit; the planted-duplicate test corpora keep comfortable
    margins.  If bit-exact cross-engine replay ever matters on real
    data, accumulate the per-bit dot sequentially (or add a dead-zone
    re-hash) — documented tradeoff, not done here."""
    rng = np.random.RandomState(seed)
    # band-major draw order — the oracle replays this exact sequence
    hp = np.stack([rng.randn(dim) for _ in range(n_bands * band_bits)])
    weights = (1 << np.arange(band_bits)).astype(np.int64)
    band_tags = (np.arange(n_bands, dtype=np.int64) << 32)[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = v.to_numpy()
        valid = np.array([x is not None for x in vals])
        out = np.empty(len(vals), dtype=object)
        if valid.any():
            m = np.stack(vals[valid]).astype(np.float64)
            bits = (m @ hp.T) > 0  # (n, n_bands*band_bits)
            packed = (
                bits.reshape(len(m), n_bands, band_bits) * weights
            ).sum(axis=2).astype(np.int64) | band_tags
            ids = np.flatnonzero(valid)
            for i, row in zip(ids, packed):
                out[i] = row.tolist()
        return pd.Series(out)

    return _buckets(vec_col.cast("array<double>"))


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    min_cosine: float = 0.9,
    dim: int | None = None,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_vectors: bool | None = None,
    broadcast_max_bytes: int = 512 << 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within one corpus.

    → (id_l, id_r, cosine) with id_l < id_r, for pairs that share at
    least one random-hyperplane band bucket AND have exact cosine ≥
    ``min_cosine``.  The scale path for corpus-wide near-dup detection
    (the self-join sibling of ``lsh_cosine_topk``): the exploded rows
    carry ONLY (id, bucket) — never the vectors — so shuffle is
    |corpus|·n_bands 16-byte rows, candidates are an equi-join per
    bucket (never an all-pairs product), and the vectors are joined
    back exactly once per side onto the DISTINCT candidate pairs for
    the exact-cosine recheck (hash-broadcast of the narrow (id, vec)
    table while it fits ``broadcast_max_bytes``; ``broadcast_vectors``
    overrides the byte-estimate auto-gate).

    ``max_bucket_size`` (optional) drops buckets with more members than
    the cap before pairing — a skew guard for degenerate corpora where
    one bucket would go quadratic; documented recall tradeoff, off by
    default so results stay exactly the bucket-join semantics.

    Deterministic everywhere: the seeded hyperplanes are closed over by
    the Arrow pandas UDF (the DuckDB oracle instead folds the same
    driver-side sequence in as SQL literals), so candidate generation
    is replayable engine-to-engine."""
    from mismo_spark._util import should_broadcast

    if dim is None:
        dim = len(df.select(vec_column).first()[0])
    v = F.col(vec_column).cast("array<double>")
    keyed = df.select(
        F.col(id_column).alias("__id"),
        F.explode(
            hyperplane_buckets(
                v, dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
            )
        ).alias("__bucket"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("__bucket")
        keyed = keyed.withColumn("__bsz", F.count(F.lit(1)).over(w)).filter(
            F.col("__bsz") <= max_bucket_size
        )
    # materialize the (id, bucket) relation ONCE before the self-join:
    # exchange reuse only fires when both sides shuffle (sort-merge
    # regime); under a broadcast-hash plan the aliased subtree — the
    # Arrow hyperplane UDF over every vector — would execute twice.
    # The checkpointed rows are the 16-byte (id, bucket) pairs the
    # docstring's shuffle bound describes, so this is cheap at any
    # scale.
    keyed = keyed.localCheckpoint(eager=True)
    left = keyed.select(F.col("__id").alias("id_l"), "__bucket")
    right = keyed.select(F.col("__id").alias("id_r"), "__bucket")
    cands = (
        left.join(right, "__bucket")
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .dropDuplicates(["id_l", "id_r"])
    )
    vecs = df.select(F.col(id_column).alias("__vid"), v.alias("__v"))
    if broadcast_vectors is None:
        broadcast_vectors = should_broadcast(vecs, max_bytes=broadcast_max_bytes)
    if broadcast_vectors:
        vecs = F.broadcast(vecs)
    pairs = (
        cands.join(vecs, cands["id_l"] == vecs["__vid"])
        .select("id_l", "id_r", F.col("__v").alias("__vl"))
        .join(vecs, F.col("id_r") == vecs["__vid"])
        .select("id_l", "id_r", "__vl", F.col("__v").alias("__vr"))
    )
    return pairs.select(
        "id_l",
        "id_r",
        cosine_pairs(F.col("__vl"), F.col("__vr")).alias("cosine"),
    ).filter(F.col("cosine") >= min_cosine)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: int | None = None,
    n_bands: int = 16,
    band_bits: int = 8,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets +
    exact re-rank within candidates.

    Same slim-exchange shape as ``embedding_near_duplicates``: the
    corpus explodes to (id, bucket) rows only, the (small) query side
    keeps its vector and is hash-broadcast, and corpus vectors join
    back once onto the distinct candidate pairs for the
    ``cosine_pairs`` re-rank — vectors never ride the n_bands-way
    bucket explode."""
    if dim is None:
        dim = len(corpus.select(vec_column).first()[0])
    v = F.col(vec_column).cast("array<double>")
    buckets = hyperplane_buckets(
        v, dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
    )
    c = corpus.select(
        F.col(id_column).alias("neighbour_id"), F.explode(buckets).alias("__bucket")
    )
    q = queries.select(
        F.col(id_column).alias("query_id"),
        v.alias("__qv"),
        F.explode(buckets).alias("__bucket"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    cands = (
        c.join(q, "__bucket")
        .filter(F.col("neighbour_id") != F.col("query_id"))
        .select("query_id", "neighbour_id", "__qv")
        .dropDuplicates(["query_id", "neighbour_id"])
    )
    cvecs = corpus.select(F.col(id_column).alias("__cid"), v.alias("__cv"))
    scored = cands.join(cvecs, cands["neighbour_id"] == cvecs["__cid"]).select(
        "query_id",
        "neighbour_id",
        cosine_pairs(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbour_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
