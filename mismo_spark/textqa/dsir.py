"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS): pick raw-corpus documents whose hashed-n-gram distribution
looks like a TARGET corpus (the "make 100 TB of Common Crawl look like
Wikipedia" selector).

Three pieces, all shuffle-light column algebra:

* **features** — each document becomes a bag of hashed n-grams
  (unigrams + bigrams of the lowercase whitespace tokens, md5-hashed
  into ``n_buckets``).  Hashing fixes the vocabulary a priori, so the
  two LMs are bounded ``n_buckets``-row tables no matter the corpus
  size.
* **bag-of-hashed-n-grams LMs** — add-α smoothed bucket probabilities
  fit on the target and the raw corpus: one explode + groupBy each
  (map-side combine; ≤ n_buckets result rows, broadcastable by
  construction).  Same sentinel contract as ``textqa.lm``: one
  ``bucket IS NULL`` row carries the exact unseen-bucket logp.
* **importance weights + Gumbel top-k** — per doc,
  ``log w = Σ_grams (log p_target − log p_raw)`` via ONE explode and
  two broadcast joins; resampling WITHOUT replacement is Gumbel
  top-k (Vieira 2014): key = log w + Gumbel noise, take the global
  top-k with ``orderBy().limit(k)`` — Spark's distributed
  TakeOrderedAndProject, never a single-partition window.

Everything is deterministic and engine-portable: gram buckets are
md5-derived (``('0x'||substr(md5(g||':'||seed),1,8))::BIGINT %
n_buckets`` in any SQL engine), and the Gumbel noise is
``−ln(−ln(u))`` of an md5-unit-uniform of the document id — so the
DuckDB oracle replays feature hashing, both LMs, the weights AND the
sampled set bit-for-bit.  No rand(), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed
from mismo_spark.text.features import tokenize

_U32 = float(1 << 32)


def _bucket(gram: Column, *, n_buckets: int, seed: int) -> Column:
    """Portable hash bucket in [0, n_buckets): first 8 md5 hex digits
    of ``gram || ':' || seed`` mod n_buckets (replayable in ANSI SQL,
    unlike xxhash64)."""
    h = F.conv(
        F.substring(F.md5(F.concat(gram, F.lit(f":{seed}"))), 1, 8), 16, 10
    ).cast("long")
    return h % F.lit(n_buckets)


def gram_strings(text: Column, *, bigrams: bool = True) -> Column:
    """array<string> of the raw n-grams: the lowercase whitespace
    tokens plus, when ``bigrams``, each adjacent token pair joined by
    one space.  Only cheap string ops run inside the higher-order
    functions — hashing happens AFTER the explode as an ordinary
    projection, because expressions inside HOF lambdas are interpreted
    (off whole-stage codegen) and an md5-per-element there measured
    ~8× slower than the same md5 over exploded rows."""
    toks = tokenize(F.lower(text))
    if not bigrams:
        return toks
    # zip toks with its own tail; the final (t_n, null) pair maps to
    # null and is filtered, leaving the n−1 adjacent pairs
    big = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda g: g.isNotNull(),
    )
    return F.concat(toks, big)


def hashed_ngrams(
    text: Column,
    *,
    n_buckets: int = 10_000,
    seed: int = 0,
    bigrams: bool = True,
) -> Column:
    """array<long> of hashed-n-gram buckets (with multiplicity):
    unigram buckets plus, when ``bigrams``, buckets of each adjacent
    token pair.  Array-valued convenience form; the hot aggregation
    paths explode :func:`gram_strings` first and hash in codegen."""
    return F.transform(
        gram_strings(text, bigrams=bigrams),
        lambda g: _bucket(g, n_buckets=n_buckets, seed=seed),
    )


def _exploded_buckets(
    docs: DataFrame,
    cols: list,
    *,
    text_col: str,
    n_buckets: int,
    seed: int,
    bigrams: bool,
) -> DataFrame:
    """(…cols, bucket) — one row per gram occurrence, bucket hashed as
    a post-explode codegen projection (see :func:`gram_strings`)."""
    return explode_computed(
        docs, cols, gram_strings(F.col(text_col), bigrams=bigrams), "__g"
    ).select(*cols, _bucket(F.col("__g"), n_buckets=n_buckets, seed=seed).alias("bucket"))


def bucket_lm(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 0,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """→ DataFrame(bucket, logp): add-α smoothed bag-of-hashed-n-grams
    probabilities, ``ln((n_b + α) / (total + α·n_buckets))``, one row
    per SEEN bucket plus the ``bucket IS NULL`` sentinel carrying the
    exact unseen-bucket logp (the hashed vocabulary is n_buckets by
    construction, so the smoothing denominator is a priori — no vocab
    count needed)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = float(alpha)
    grams = _exploded_buckets(
        docs, [], text_col=text_col, n_buckets=n_buckets, seed=seed, bigrams=bigrams
    )
    # materialize once: counts feeds BOTH the totals aggregate and the
    # seen-bucket join, and the subtree below it is the gram explode
    # over the ENTIRE corpus — twice, for the raw-corpus LM, without
    # this.  The checkpointed relation is ≤ n_buckets rows.
    counts = (
        grams.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(F.sum("__n").alias("__total"))
    denom = F.coalesce(F.col("__total"), F.lit(0)) + F.lit(a * n_buckets)
    seen = counts.crossJoin(F.broadcast(totals)).select(
        "bucket", F.log((F.col("__n") + F.lit(a)) / denom).alias("logp")
    )
    unseen = totals.select(
        F.lit(None).cast("long").alias("bucket"),
        F.log(F.lit(a) / denom).alias("logp"),
    )
    return seen.unionByName(unseen)


def importance_weights(
    docs: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 0,
    bigrams: bool = True,
    broadcast_lm: bool = True,
) -> DataFrame:
    """→ DataFrame(id_col, n_grams, log_weight): per document, the DSIR
    importance log-weight ``Σ_grams (log p_target(b) − log p_raw(b))``.
    Feature params (n_buckets, seed, bigrams) must match the ones the
    LMs were fit with.  Documents with no grams get log_weight 0
    (weight 1 — no evidence either way)."""

    def _split(lm: DataFrame, tag: str):
        seen = lm.where(F.col("bucket").isNotNull()).select(
            "bucket", F.col("logp").alias(f"__lp_{tag}")
        )
        sent = lm.where(F.col("bucket").isNull()).select(
            F.col("logp").alias(f"__unseen_{tag}")
        )
        if broadcast_lm:
            seen = F.broadcast(seen)
        return seen, F.broadcast(sent)

    t_seen, t_sent = _split(target_lm, "t")
    r_seen, r_sent = _split(raw_lm, "r")
    grams = _exploded_buckets(
        docs,
        [F.col(id_col)],
        text_col=text_col,
        n_buckets=n_buckets,
        seed=seed,
        bigrams=bigrams,
    )
    scored = (
        grams.join(t_seen, "bucket", "left")
        .join(r_seen, "bucket", "left")
        .join(t_sent, F.lit(True), "left")
        .join(r_sent, F.lit(True), "left")
        .select(
            id_col,
            (
                F.coalesce("__lp_t", "__unseen_t")
                - F.coalesce("__lp_r", "__unseen_r")
            ).alias("__lw"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"), F.sum("__lw").alias("log_weight")
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def gumbel_key(id_col: Column, *, seed: int = 42) -> Column:
    """Deterministic standard-Gumbel noise from the md5 of (id, seed):
    ``−ln(−ln(u))`` with ``u = (h32 + 1) / (2³² + 1)`` ∈ (0, 1) — the
    +1 shift keeps both logs finite.  Engine-portable (md5 arithmetic
    only), so sampled sets are stable across runs, partitionings and
    engines."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", id_col.cast("string"), F.lit(str(seed)))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_U32 + 1.0)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 0,
    gumbel_seed: int = 42,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """→ the k raw documents selected by DSIR: importance log-weights
    of ``raw`` against LMs fit on ``target`` and ``raw`` themselves,
    resampled without replacement via Gumbel top-k
    (key = log_weight + Gumbel(id), global distributed top-k).

    Output: (id_col, n_grams, log_weight, key), the selected k rows.
    Deterministic for fixed seeds; ties (astronomically unlikely with
    continuous keys) break on the id via the sort order."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    t_lm = bucket_lm(
        target, text_col=text_col, n_buckets=n_buckets, seed=seed,
        alpha=alpha, bigrams=bigrams,
    )
    r_lm = bucket_lm(
        raw, text_col=text_col, n_buckets=n_buckets, seed=seed,
        alpha=alpha, bigrams=bigrams,
    )
    w = importance_weights(
        raw, t_lm, r_lm,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        seed=seed, bigrams=bigrams,
    )
    keyed = w.withColumn(
        "key", F.col("log_weight") + gumbel_key(F.col(id_col), seed=gumbel_seed)
    )
    return keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(k)
