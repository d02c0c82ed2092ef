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
    toks = docs.select(
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
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
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("token"),
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
