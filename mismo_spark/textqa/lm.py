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
"""

from __future__ import annotations

import math

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
    corpus's lowercase whitespace tokens.  The companion
    ``unseen_logp`` (for tokens absent from this LM) is
    ln(k / (total + k·(vocab+1))) — derive it with the same constants,
    as ``unigram_perplexity`` does internally."""
    if k_smoothing <= 0:
        raise ValueError(f"k_smoothing must be > 0, got {k_smoothing}")
    toks = docs.select(
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
    totals = counts.agg(
        F.sum("__n").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(
            (F.col("__n") + F.lit(float(k_smoothing)))
            / (
                F.col("__total")
                + F.lit(float(k_smoothing)) * (F.col("__vocab") + 1)
            )
        ).alias("logp"),
    )


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

    Tokens absent from the LM get the smoothed unseen probability, so
    scoring a corpus against a FOREIGN reference LM (the CCNet setup)
    is well-defined.  Documents with no tokens get NULL scores.
    """
    if lm is None:
        lm = unigram_lm(docs, text_col=text_col, k_smoothing=k_smoothing)
    stats = lm.agg(
        F.sum(F.exp("logp")).alias("__mass"), F.count(F.lit(1)).alias("__vocab")
    )
    # recover ln p(unseen) from the LM itself: with add-k MLE the
    # leftover mass is k/(total + k·(vocab+1)) = (1 - Σp)/1 … but the
    # algebra needs total; carry it via one tiny collect-free join is
    # overkill — recompute from the mass identity:
    #   Σ_seen p = (total + k·vocab)/(total + k·(vocab+1))
    #   p_unseen = 1 - Σ_seen p      (exactly the remaining mass)
    unseen = stats.select(
        F.log(F.greatest(F.lit(1.0) - F.col("__mass"), F.lit(1e-300))).alias(
            "__unseen_logp"
        )
    )
    b = F.broadcast(lm) if broadcast_lm else lm
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("token"),
    )
    scored = (
        toks.join(b, "token", "left")
        .crossJoin(F.broadcast(unseen))
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
