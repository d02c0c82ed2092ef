"""Document deduplication for training-data pipelines.

First-class extras beyond the reference: exact dedup (hash-groupBy),
MinHash+LSH near-dup, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each built on the same linker machinery and expressed as
declarative DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.lsh import MinhashLshLinker
from mismo_spark.sets.compare import jaccard
from mismo_spark.text.features import ngrams, tokenize
from mismo_spark.textqa import fingerprint_hex
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


def exact_duplicates(
    df: DataFrame, text_column: str = "text", *, id_column: str = "record_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup via hash-groupBy: one shuffle on the fingerprint,
    partial-aggregated.  → (fp, n_dups, record_ids) for groups n ≥ 2."""
    return (
        df.select(
            F.col(id_column),
            fingerprint_hex(F.col(text_column), normalize=normalize).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(id_column)).alias("record_ids"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def exact_dedupe_keep_first(
    df: DataFrame, text_column: str = "text", *, id_column: str = "record_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the min-id row per fingerprint (deterministic survivor).

    min_by aggregation — no window over the full table, no sort."""
    fp = fingerprint_hex(F.col(text_column), normalize=normalize).alias("__fp")
    keep = (
        df.select(F.col(id_column), fp)
        .groupBy("__fp")
        .agg(F.min(id_column).alias(id_column))
        .select(id_column)
    )
    return df.join(keep, id_column, "left_semi")


def minhash_near_duplicates(
    df: DataFrame,
    text_column: str = "text",
    *,
    id_column: str = "record_id",
    shingle_size: int = 3,
    band_size: int = 4,
    n_bands: int = 16,
    min_jaccard: float = 0.7,
    seed: int = 42,
    hasher: str = "xxhash64",
    broadcast_records: bool | None = None,
    broadcast_max_bytes: int = 512 << 20,
    verify: str = "exact",
) -> DataFrame:
    """Shingle → minhash → band → bucket-join near-dup detection.

    Candidate pairs come from LSH (recall-oriented), then a verify
    step filters to ``min_jaccard`` (precision):

    * ``verify="exact"`` — true token-shingle Jaccard, joining the
      (record_id, shingles) table back onto the pairs
      → (record_id_l, record_id_r, jaccard_sim)
    * ``verify="estimate"`` — Jaccard estimated from the
      ``band_size × n_bands``-component minhash sketch (agreeing
      fraction, SE ~ sqrt(j(1-j)/n)): the rejoin table shrinks from
      KB-sized shingle arrays to ~8·n_hashes bytes per record, so it
      broadcasts at corpus sizes where shingles cannot, and the
      per-pair cost is O(n_hashes) instead of a set intersection —
      the scalable screen at 10^12 documents (follow with an exact
      pass on the survivors if the boundary matters)
      → (record_id_l, record_id_r, jaccard_est).

    ``broadcast_records`` controls the pair↔shingles join strategy for
    the Jaccard recheck: ``True`` hash-broadcasts the narrow
    (record_id, shingles) table so the candidate-pair table streams out
    of the band join with ZERO pair-table shuffles — without it, both
    shingle-array sides re-shuffle per candidate pair, the exact
    multi-GB-exchange bottleneck the pipeline's compare stage fixed
    (see Linkage.links_with_both).  Default ``None`` auto-gates on the
    estimated broadcast size (byte-based, not rows — shingle arrays can
    be KBs per record) vs ``broadcast_max_bytes``."""
    from mismo_spark._util import should_broadcast

    # two-step select: tokens materialize first so the shingle HOF
    # lambda only touches attribute refs (see word_shingles_from_tokens)
    recs = df.select(
        F.col(id_column).alias("record_id"),
        tokenize(F.lower(F.col(text_column))).alias("__toks"),
    ).select(
        "record_id",
        F.array_distinct(
            word_shingles_from_tokens(F.col("__toks"), shingle_size)
        ).alias("shingles"),
    )
    lk = MinhashLshLinker(
        "shingles",
        band_size=band_size,
        n_bands=n_bands,
        seed=seed,
        task="dedupe",
        hasher=hasher,
    )(recs)
    if verify == "estimate":
        # shingling feeds the band join, the sketch, and the gate count
        # — persist it once, same as the exact path does
        recs = recs.persist()
        sigs = recs.select(
            "record_id",
            minhash_signature(
                F.col("shingles"),
                n_hashes=band_size * n_bands,
                seed=seed,
                hasher=hasher,
            ).alias("signature"),
        ).persist()
        if broadcast_records is None:
            broadcast_records = should_broadcast(
                sigs, max_bytes=broadcast_max_bytes
            )
        pairs = Linkage(sigs, sigs, lk.links).links_with_both(
            broadcast_records=broadcast_records
        )
        return pairs.select(
            ID_L,
            ID_R,
            estimated_jaccard(
                F.col("signature_l"), F.col("signature_r")
            ).alias("jaccard_est"),
        ).filter(F.col("jaccard_est") >= min_jaccard)
    if verify != "exact":
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    if broadcast_records is None:
        recs = recs.persist()  # shingling runs once for gate + bands + recheck
        broadcast_records = should_broadcast(recs, max_bytes=broadcast_max_bytes)
    pairs = Linkage(recs, recs, lk.links).links_with_both(
        broadcast_records=broadcast_records
    )
    return pairs.select(
        ID_L,
        ID_R,
        jaccard(F.col("shingles_l"), F.col("shingles_r")).alias("jaccard_sim"),
    ).filter(F.col("jaccard_sim") >= min_jaccard)


def word_shingles_from_tokens(toks: Column, k: int) -> Column:
    """Word k-gram shingle strings from an already-MATERIALIZED token
    array column.

    Pass an attribute (``F.col(...)``), not an inline expression: any
    expression referenced inside a higher-order-function lambda is
    re-evaluated PER ELEMENT, so an inline ``tokenize()`` here would
    run its split once per shingle index instead of once per row — and
    because HOF projects fall off whole-stage codegen, it runs on the
    interpreted path too (observed: a 10×+ stage blowup in the
    blocking profile before this was split into two selects)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    # per-index F.get, not F.slice: HOF lambda bodies are interpreted
    # and the slice form measured ~6× slower at identical output (all
    # gets in range — idx stops at size−k; tokens are never null)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.get(toks, i + F.lit(j)) for j in range(k)]),
        )
    )


def _word_shingles(text: Column, k: int) -> Column:
    """One-shot text→shingles expression.  ONLY for single-use contexts
    (e.g. as the direct input of explode); inside a multi-reference
    select, materialize tokens first and use
    :func:`word_shingles_from_tokens` — see its docstring."""
    toks = tokenize(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def simhash(text: Column, *, n_bits: int = 64, seed: int = 42) -> Column:
    """SimHash of the whitespace token set as a single column expression.

    Convenience form for one-off use on small inputs: the per-bit
    ``F.aggregate`` lambdas run on Spark's interpreted expression path.
    At scale use :func:`simhash_signatures` (explode → groupBy, fully
    whole-stage-codegen) — same output values."""
    toks = F.array_distinct(tokenize(F.lower(text)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    def popcount_fn(bb: int):
        # 2-arg lambda required; closing over bb via factory (a 3-arg
        # lambda would be misparsed by the higher-order function API)
        return lambda acc, h: acc + F.shiftright(h, bb).bitwiseAND(F.lit(1)).cast("int")

    bits = []
    for b in range(n_bits):
        # popcount of bit b over all token hashes vs half the count
        ones = F.aggregate(hashes, F.lit(0), popcount_fn(b))
        bit = (ones * 2 > F.size(hashes)).cast("long")
        bits.append(F.shiftleft(bit, b))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return F.when(F.size(toks) > 0, out)


def _token_hash(tok: Column, *, hasher: str, seed: int) -> Column:
    """Per-token integer hash for sketching.

    ``xxhash64`` (default): JVM builtin, full 64 bits, fastest.
    ``md5_32``: lower 32 bits parsed from the md5 hex digest — slower,
    but byte-identical to ``('0x'||substr(md5(t||':seed'),1,8))::BIGINT``
    in ANSI SQL engines, so results are independently verifiable by the
    DuckDB oracle harness."""
    if hasher == "xxhash64":
        return F.xxhash64(tok, F.lit(seed))
    if hasher == "md5_32":
        return F.conv(
            F.substring(F.md5(F.concat(tok, F.lit(f":{seed}"))), 1, 8), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hasher {hasher!r}")


def simhash_signatures(
    df: DataFrame,
    text_column: str = "text",
    *,
    id_column: str = "record_id",
    n_bits: int = 64,
    seed: int = 42,
    hasher: str = "xxhash64",
) -> DataFrame:
    """→ (record_id, sh): SimHash per record via explode → groupBy.

    The scale path: explode the distinct token set, hash each token once
    (8-byte long), then ONE hash aggregation with ``n_bits`` conditional
    sums — every operator (explode, hash-of-string, sum, comparison) is
    whole-stage codegen, and map-side partial aggregation collapses each
    record's tokens before the shuffle, so shuffle volume is
    |records|·n_bits·8B regardless of document length.  Records with an
    empty/null token set produce no row (they cannot near-dup).

    Same bit definition as :func:`simhash`: bit b set iff the majority
    of token hashes have bit b set (strict majority, ties → 0).
    """
    if n_bits < 1 or n_bits > 64:
        raise ValueError(f"n_bits must be in [1, 64], got {n_bits}")
    toks = F.array_distinct(tokenize(F.lower(F.col(text_column))))
    ex = df.select(
        F.col(id_column).alias("record_id"), F.explode(toks).alias("__t")
    ).select(
        "record_id", _token_hash(F.col("__t"), hasher=hasher, seed=seed).alias("__h")
    )
    sums = ex.groupBy("record_id").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.shiftrightunsigned(F.col("__h"), b).bitwiseAND(F.lit(1))
            ).alias(f"__b{b}")
            for b in range(n_bits)
        ],
    )
    sh = None
    for b in range(n_bits):
        bit = F.shiftleft(
            (F.col(f"__b{b}") * 2 > F.col("__n")).cast("long"), b
        )
        sh = bit if sh is None else sh.bitwiseOR(bit)
    return sums.select("record_id", sh.alias("sh"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance of two int64 simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    text_column: str = "text",
    *,
    id_column: str = "record_id",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    n_bits: int = 64,
    seed: int = 42,
    hasher: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup with the standard block-permutation trick: split
    the ``n_bits`` hash into ``n_blocks`` blocks; any pair within
    ``max_hamming ≤ n_blocks − 1`` bits shares at least one exact block
    (pigeonhole) → equi-join per block, union, exact hamming filter.
    No cross join anywhere.

    ``n_blocks`` defaults to ``max_hamming + 1`` — the smallest block
    count with a completeness guarantee.  Passing a smaller value raises:
    it would silently miss pairs whose differing bits land in every
    block, making the result NOT "all pairs within max_hamming" as the
    API promises."""
    recs = simhash_signatures(
        df, text_column, id_column=id_column, n_bits=n_bits, seed=seed, hasher=hasher
    )
    return hamming_banded_pairs(
        recs,
        hash_column="sh",
        id_column="record_id",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        n_bits=n_bits,
    )


def hamming_banded_pairs(
    recs: DataFrame,
    *,
    hash_column: str,
    id_column: str = "record_id",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    n_bits: int = 64,
) -> DataFrame:
    """→ (record_id_l, record_id_r, hamming): ALL pairs of ``recs``
    whose int64 ``hash_column`` values differ in ≤ ``max_hamming`` bits,
    via the block-permutation trick — the shared blocking core of
    :func:`simhash_near_duplicates` and the perceptual-hash near-dup
    family (``multimodal.phash_near_duplicates``).

    Splits the ``n_bits`` hash into ``n_blocks`` bit-blocks; any pair
    within ``max_hamming ≤ n_blocks − 1`` bits shares at least one exact
    block (pigeonhole) → one equi-join per block, union, exact hamming
    filter.  No cross join anywhere; each join shuffles only
    (id, hash, block-key) rows.  ``n_blocks`` defaults to the smallest
    divisor of ``n_bits`` that is ≥ ``max_hamming + 1`` — the smallest
    even-width block count with the completeness guarantee; a smaller
    explicit value raises rather than silently missing pairs."""
    if n_blocks is None:
        n_blocks = next(
            (d for d in range(max_hamming + 1, n_bits + 1) if n_bits % d == 0),
            None,
        )
        if n_blocks is None:
            raise ValueError(
                f"max_hamming={max_hamming} >= n_bits={n_bits}: every pair "
                "would qualify; this needs no blocking"
            )
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_blocks >= {max_hamming + 1} "
            f"(got {n_blocks}): with k blocks the pigeonhole guarantee only "
            "covers pairs differing in <= k-1 bits; beyond that pairs are "
            "silently missed. Pass a larger n_blocks (or omit it)."
        )
    if n_bits % n_blocks != 0:
        raise ValueError(f"n_bits={n_bits} not divisible by n_blocks={n_blocks}")
    width = n_bits // n_blocks
    # materialize the (id, hash) projection ONCE: each of the n_blocks
    # equi-joins references both sides, so a lazy plan would re-execute
    # the signature computation (and re-scan its input) 2·n_blocks
    # times — for payload-derived hashes (phash) that is 2·n_blocks
    # full decodes of the corpus.  The checkpointed relation is 16
    # bytes/record; block keys are derived from it per branch.
    sigs = recs.select(
        F.col(id_column).alias("record_id"), F.col(hash_column).alias("__h")
    ).localCheckpoint(eager=True)
    parts = []
    for blk in range(n_blocks):
        key = F.shiftrightunsigned(F.col("__h"), blk * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        keyed = sigs.select("record_id", "__h", key.alias("__blk"))
        l = keyed.select(
            F.col("record_id").alias(ID_L), F.col("__h").alias("__h_l"), "__blk"
        )
        r = keyed.select(
            F.col("record_id").alias(ID_R), F.col("__h").alias("__h_r"), "__blk"
        )
        parts.append(
            l.join(r, "__blk")
            .filter(F.col(ID_L) < F.col(ID_R))
            .select(ID_L, ID_R, "__h_l", "__h_r")
        )
    from functools import reduce

    cands = reduce(DataFrame.unionByName, parts).dropDuplicates([ID_L, ID_R])
    return cands.select(
        ID_L,
        ID_R,
        hamming64(F.col("__h_l"), F.col("__h_r")).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_column: str = "text",
    *,
    id_column: str = "record_id",
    n: int = 3,
    blocking_key=None,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Character-n-gram Jaccard over pairs blocked by ``blocking_key``
    (a column spec).  WITHOUT a blocking key the all-pairs product is
    avoided too: candidates come from the prefix-filtering
    set-similarity join (``sets/ssjoin.py``), which is EXACT at the
    ``min_jaccard`` threshold — same output as the cross join, never
    its plan."""
    if blocking_key is None:
        from mismo_spark.sets.ssjoin import prefix_filter_pairs

        recs = df.select(
            F.col(id_column).alias("record_id"),
            ngrams(F.lower(F.col(text_column)), n).alias("grams"),
        )
        return prefix_filter_pairs(
            recs, "grams", threshold=min_jaccard, id_col="record_id"
        ).select(ID_L, ID_R, F.col("jaccard").alias("jaccard_sim"))
    # blocking_key is not None from here on: the None path returned
    # above via the exact prefix-filter ssjoin
    recs = df.select(
        F.col(id_column).alias("record_id"),
        F.array_distinct(ngrams(F.lower(F.col(text_column)), n)).alias("grams"),
        bind_one(df, blocking_key).alias("__bk"),
    )
    l = recs.select(
        F.col("record_id").alias(ID_L), F.col("grams").alias("grams_l"), F.col("__bk")
    )
    r = recs.select(
        F.col("record_id").alias(ID_R), F.col("grams").alias("grams_r"), F.col("__bk")
    )
    joined = l.join(r, "__bk")
    return (
        joined.filter(F.col(ID_L) < F.col(ID_R))
        .select(
            ID_L, ID_R, jaccard(F.col("grams_l"), F.col("grams_r")).alias("jaccard_sim")
        )
        .filter(F.col("jaccard_sim") >= min_jaccard)
    )


def minhash_signature(
    terms: Column, *, n_hashes: int, seed: int = 42, hasher: str = "xxhash64"
) -> Column:
    """The n-component minhash sketch of an array-of-terms column —
    same hash family (and seeds) as ``MinhashLshLinker``, so bands and
    sketch agree.  xxhash64 → array<long>; md5 → array<string>
    (lexicographic minima of ``md5(term || ':' || seed+i)``, the
    ANSI-SQL-replayable family).  Empty/null term sets → NULL."""
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if hasher == "xxhash64":
        def hash_fn(s: int):
            return lambda t: F.xxhash64(t, F.lit(s))
    elif hasher == "md5":
        def hash_fn(s: int):
            return lambda t: F.md5(F.concat(t, F.lit(f":{s}")))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    mins = [
        F.array_min(F.transform(terms, hash_fn(seed + i)))
        for i in range(n_hashes)
    ]
    return F.when(F.size(terms) > 0, F.array(*mins))


def estimated_jaccard(sig_l: Column, sig_r: Column) -> Column:
    """Jaccard ESTIMATE from two equal-length minhash sketches: the
    fraction of agreeing components (standard error ~sqrt(j(1-j)/n)).
    NULL if either sketch is NULL or empty (no information — never a
    silent NaN that poisons downstream aggregates)."""
    agree = F.aggregate(
        F.zip_with(
            sig_l, sig_r, lambda a, b: F.when(a == b, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.when(
        sig_l.isNull()
        | sig_r.isNull()
        | (F.size(sig_l) == 0)
        | (F.size(sig_r) == 0),
        F.lit(None).cast("double"),
    ).otherwise(agree.cast("double") / F.size(sig_l))
