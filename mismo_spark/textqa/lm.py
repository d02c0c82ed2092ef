"""Unigram language-model perplexity — the in-engine version of the
CCNet-style "perplexity against a reference LM" quality signal
(Wenzek et al. 2020 use KenLM; the unigram MLE here needs no external
model and is exactly replayable in ANSI SQL, which is the point in
this engine: the SCORING plumbing is identical, swap the LM table for
a real one in production).

A document full of ordinary words scores low perplexity; gibberish,
boilerplate codes, or wrong-language text scores high — a cheap,
corpus-calibrated screen between the heuristic ``quality_score`` and
an expensive model pass.

Plan shape: the LM is one (token, logp) aggregation over the TRAINING
corpus (groupBy token, map-side combine); scoring explodes the target
docs once and joins the LM — broadcast-able (vocabulary-sized, not
corpus-sized) — then one per-doc average.  No UDFs.

LM table contract: one row per seen token, plus ONE sentinel row with
``token IS NULL`` whose ``logp`` is the smoothed unseen-token
log-probability ln(k / (total + k·(vocab+1))).  Carrying the unseen
mass as data keeps foreign-LM scoring exact — recovering it from
1 − Σ exp(logp) would be catastrophically cancellative at real
vocabulary sizes (the sum's float error exceeds the unseen mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed
from mismo_spark.text.features import tokenize


def unigram_lm(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k_smoothing: float = 1.0,
) -> DataFrame:
    """→ DataFrame(token, logp): add-k-smoothed unigram MLE over the
    corpus's lowercase whitespace tokens, plus the sentinel
    ``token IS NULL`` row carrying the exact unseen-token logp (see
    module docstring — never recovered from the probability mass)."""
    if k_smoothing <= 0:
        raise ValueError(f"k_smoothing must be > 0, got {k_smoothing}")
    k = float(k_smoothing)
    toks = explode_computed(
        docs, [], tokenize(F.lower(F.col(text_col))), "token"
    )
    # materialize once: counts feeds the totals aggregate AND the seen
    # join — the corpus token explode would execute twice otherwise
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("__n").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    denom = F.col("__total") + F.lit(k) * (F.col("__vocab") + 1)
    seen = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log((F.col("__n") + F.lit(k)) / denom).alias("logp"),
    )
    unseen = totals.select(
        F.lit(None).cast("string").alias("token"),
        F.log(F.lit(k) / denom).alias("logp"),
    )
    return seen.unionByName(unseen)


def unigram_perplexity(
    docs: DataFrame,
    lm: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smoothing: float = 1.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """→ DataFrame(id_col, n_tokens, cross_entropy, perplexity): per
    document, the mean negative log-probability of its tokens under
    ``lm`` (default: an LM trained on ``docs`` itself — self-scoring,
    useful for outlier screens) and its exponential.

    ``lm`` follows the ``unigram_lm`` contract: (token, logp) rows
    plus the ``token IS NULL`` sentinel for unseen tokens, so scoring
    a corpus against a FOREIGN reference LM (the CCNet setup) is
    exact.  An LM without the sentinel treats unseen tokens as if
    absent from the document (legacy tables); documents with no tokens
    get NULL scores.

    A self-trained LM is persisted for the duration of the call — the
    corpus-wide token aggregation would otherwise run once for the
    sentinel extraction and again for the scoring join.
    """
    self_trained = lm is None
    if self_trained:
        lm = unigram_lm(docs, text_col=text_col, k_smoothing=k_smoothing)
        lm = lm.persist()
    seen = lm.where(F.col("token").isNotNull())
    unseen = lm.where(F.col("token").isNull()).select(
        F.col("logp").alias("__unseen_logp")
    )
    b = F.broadcast(seen) if broadcast_lm else seen
    toks = explode_computed(
        docs, [F.col(id_col)], tokenize(F.lower(F.col(text_col))), "token"
    )
    scored = (
        toks.join(b, "token", "left")
        .join(F.broadcast(unseen), F.lit(True), "left")
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("__unseen_logp")).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("__lp")).alias("cross_entropy"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"),
    )


def bigram_lm(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """→ DataFrame(token_l, token_r, logp): MLE conditional bigram
    log-probabilities ``ln(count(w₁w₂) / count(w₁))`` over the corpus's
    lowercase whitespace tokens.  Unsmoothed on purpose — scoring backs
    off to the (smoothed) unigram LM for unseen bigrams (Stupid
    Backoff, Brants et al. 2007: no discounting, just α·P_uni), so the
    bigram table only needs SEEN bigrams.

    Plan: ONE explode of adjacent token pairs (a higher-order zip, no
    second corpus pass), groupBy(w₁, w₂) with map-side combine, then a
    join against the w₁ marginal — which is derived by RE-AGGREGATING
    the (checkpointed) bigram counts, not by a second pass over the
    pair table: count(w₁·) = Σ_w₂ count(w₁w₂), and the two groupBys
    partition on different keys so exchange reuse could never fire."""
    toks = tokenize(F.lower(F.col(text_col)))
    # F.get is 0-based and NULL-safe out of range (no ANSI index traps)
    pairs_arr = F.filter(
        F.transform(
            toks,
            lambda t, i: F.when(
                i < F.size(toks) - 1,
                F.struct(
                    t.alias("token_l"),
                    F.get(toks, i + F.lit(1)).alias("token_r"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    pairs = explode_computed(docs, [], pairs_arr, "__p").select(
        "__p.token_l", "__p.token_r"
    )
    c12 = (
        pairs.groupBy("token_l", "token_r")
        .agg(F.count(F.lit(1)).alias("__n12"))
        .localCheckpoint(eager=True)
    )
    c1 = c12.groupBy("token_l").agg(F.sum("__n12").alias("__n1"))
    return c12.join(c1, "token_l").select(
        "token_l",
        "token_r",
        F.log(F.col("__n12") / F.col("__n1")).alias("logp"),
    )


def bigram_perplexity(
    docs: DataFrame,
    bigram: DataFrame | None = None,
    unigram: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
    k_smoothing: float = 1.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """→ DataFrame(id_col, n_tokens, cross_entropy, perplexity):
    per-document mean negative log Stupid-Backoff score — each token
    after the first scores ``ln P(w₂|w₁)`` when the bigram was seen,
    else ``ln α + logp_uni(w₂)``; the document's FIRST token (no left
    context) scores its unigram logp with no backoff penalty.

    Stupid Backoff scores are unnormalized (Brants et al. 2007 §4 —
    deliberately not a probability distribution), so "perplexity" here
    is exp(mean −ln S): a corpus-calibrated quality screen that ranks
    documents exactly like CCNet's LM filter ranks them, not a true
    held-out perplexity.  Defaults self-train both LMs on ``docs``;
    pass foreign ``bigram``/``unigram`` tables (contracts:
    ``bigram_lm`` / ``unigram_lm``, incl. the unigram NULL sentinel)
    to replicate the reference-LM setup.

    Scale note: ``broadcast_lm`` broadcasts both tables.  The SEEN
    bigram table grows with the corpus (unlike the hashed-bucket LMs in
    ``textqa.dsir``); past executor memory set ``broadcast_lm=False``
    and the scoring join becomes a sort-merge on (token_l, token_r) —
    or fit the LM on a sample, which is what a reference-LM deployment
    does anyway."""
    if backoff <= 0 or backoff > 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    if unigram is None:
        unigram = unigram_lm(docs, text_col=text_col, k_smoothing=k_smoothing)
        # vocab-sized (small); stays cached for the application — pass
        # your own LM tables to manage caching in long pipelines
        unigram = unigram.persist()
    if bigram is None:
        bigram = bigram_lm(docs, text_col=text_col)
    uni_seen = unigram.where(F.col("token").isNotNull())
    uni_unseen = unigram.where(F.col("token").isNull()).select(
        F.col("logp").alias("__unseen_logp")
    )
    big = bigram.select(
        F.col("token_l").alias("__prev"),
        F.col("token_r").alias("token"),
        F.col("logp").alias("__blp"),
    )
    if broadcast_lm:
        uni_seen = F.broadcast(uni_seen)
        big = F.broadcast(big)
    toks = tokenize(F.lower(F.col(text_col)))
    with_prev = F.transform(
        toks,
        lambda t, i: F.struct(
            t.alias("token"),
            # 0-based get(i-1) is NULL at i=0: the first token has no
            # left context
            F.get(toks, i - F.lit(1)).alias("prev"),
        ),
    )
    exploded = explode_computed(docs, [F.col(id_col)], with_prev, "__t").select(
        id_col, "__t.token", F.col("__t.prev").alias("__prev")
    )
    scored = (
        exploded.join(big, ["__prev", "token"], "left")
        .join(uni_seen.withColumnRenamed("logp", "__ulp"), "token", "left")
        .join(F.broadcast(uni_unseen), F.lit(True), "left")
        .select(
            id_col,
            F.when(F.col("__blp").isNotNull(), F.col("__blp"))
            .otherwise(
                F.when(F.col("__prev").isNotNull(), F.log(F.lit(backoff)))
                .otherwise(F.lit(0.0))
                + F.coalesce("__ulp", "__unseen_logp")
            )
            .alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("__lp")).alias("cross_entropy"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"),
    )
