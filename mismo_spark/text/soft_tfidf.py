"""SoftTFIDF hybrid comparer — Cohen, Ravikumar & Fienberg,
"A Comparison of String Distance Metrics for Name-Matching Tasks"
(IIWeb 2003).

TF-IDF cosine alone misses typos ("smith" vs "smiht" share no token);
Jaro-Winkler alone weights "llc" as heavily as a rare surname.
SoftTFIDF combines them: tokens of one side soft-match the other
side's CLOSEST token by Jaro-Winkler, and every match above
``threshold`` contributes the product of the two records' normalized
TF-IDF weights scaled by the similarity:

    score(S, T) = Σ_{w ∈ S, max_u JW(w,u) ≥ θ}
                      V(w, S) · V(u*, T) · JW(w, u*)

with V the L2-normalized (1 + ln tf) · ln(N / df) weight and
u* = argmax_u JW(w, u) (ties broken by the lexicographically smallest
token, so the score is deterministic).  Like the paper, this is a
short-field comparer (names, titles, address lines): the token-pair
expansion is Σ|S|·|T| per candidate pair.

Spark plan shape — a pure DataFrame composition, NO bespoke UDF:
  1. weights table W(record_id, token, v): explode + two groupBys
     (tf per record-token, df per token) + one per-record L2 norm —
     all map-side-combinable aggregations
  2. token-pair table: candidate pairs equi-join W twice (on each
     record id) — the only pair-sized exchange, rows are
     (pair, token, token, two doubles)
  3. JW via the existing Arrow pandas-UDF kernel, whose in-UDF
     unique-pair dedup collapses the heavy token-pair repetition
     (the same few name tokens recur across thousands of pairs)
  4. per-(pair, left-token) argmax by one struct max-aggregation,
     threshold filter, and a final sum groupBy per pair.

Note the asymmetry (soft-matching runs from the LEFT side's tokens,
as in the paper); call twice and average for a symmetric score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.text.similarity import jaro_winkler_similarity


def tfidf_weights(
    records: DataFrame,
    *,
    id_col: str = "record_id",
    token_col: str = "tokens",
) -> DataFrame:
    """→ DataFrame(id_col, token, v): L2-normalized
    (1 + ln tf) · ln(N / df) weights per record token.

    Tokens occurring in every record get weight 0 (ln 1); a record
    whose every token weighs 0 keeps v = 0 rather than dividing by a
    zero norm.
    """
    toks = records.select(
        F.col(id_col), F.explode(token_col).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("__tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    n = records.select(F.count(F.lit(1)).alias("__n"))
    raw = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__raw",
            (F.lit(1.0) + F.log(F.col("__tf").cast("double")))
            * F.log(F.col("__n").cast("double") / F.col("__df")),
        )
    )
    # materialize once: raw feeds BOTH the norm aggregate and the
    # normalize join — the explode → tf → df pipeline would execute
    # twice otherwise
    raw = raw.localCheckpoint(eager=True)
    norm = raw.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("__raw") * F.col("__raw"))).alias("__norm")
    )
    return (
        raw.join(norm, id_col)
        .select(
            id_col,
            "token",
            F.when(F.col("__norm") > 0, F.col("__raw") / F.col("__norm"))
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
    )


def soft_tfidf_pairs(
    pairs: DataFrame,
    records: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "record_id",
    token_col: str = "tokens",
    id_l: str = "record_id_l",
    id_r: str = "record_id_r",
    broadcast_weights: bool | None = None,
) -> DataFrame:
    """→ DataFrame(id_l, id_r, soft_tfidf): the SoftTFIDF score of
    each candidate pair, soft-matching LEFT tokens against RIGHT
    tokens at Jaro-Winkler ≥ ``threshold``.

    Pairs where either side has no tokens (or nothing matches) score
    0.0.  Deterministic: the argmax right-token breaks JW ties by the
    lexicographically smallest token string.

    ``broadcast_weights`` (default: byte-gated auto via
    ``should_broadcast``) hash-broadcasts the narrow (id, token, v)
    weights table into both pair joins so the PAIR table is never
    shuffled — the same policy as the pipeline's pair-feature joins;
    pass False to force shuffle joins when the vocabulary is huge.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from mismo_spark._util import should_broadcast

    # materialize the weights and the pair projection once each: w is
    # consumed by both pair joins (and the broadcast-size probe), and
    # pairs by the token join AND the final zero-fill join — behind
    # the latter can sit a whole blocking pipeline
    w = tfidf_weights(records, id_col=id_col, token_col=token_col).localCheckpoint(
        eager=True
    )
    pairs = pairs.select(id_l, id_r).localCheckpoint(eager=True)
    if broadcast_weights is None:
        broadcast_weights = should_broadcast(w)
    if broadcast_weights:
        w = F.broadcast(w)
    wl = w.select(
        F.col(id_col).alias(id_l),
        F.col("token").alias("__wtok"),
        F.col("v").alias("__vl"),
    )
    wr = w.select(
        F.col(id_col).alias(id_r),
        F.col("token").alias("__utok"),
        F.col("v").alias("__vr"),
    )
    tp = pairs.select(id_l, id_r).join(wl, id_l).join(wr, id_r)
    jw = jaro_winkler_similarity(F.col("__wtok"), F.col("__utok"))
    scored = tp.withColumn("__jw", jw)
    # argmax over the right tokens: max JW, ties -> smallest token.
    # A struct max orders elementwise, so negate nothing: we want
    # (jw DESC, token ASC) == max of (jw, reversed-token)?  Simpler and
    # portable: keep max jw first, then min token among the jw-ties.
    best = (
        scored.groupBy(id_l, id_r, "__wtok")
        .agg(
            F.max("__jw").alias("__bjw"),
            F.min(F.col("__vl")).alias("__vl"),  # constant per group
            F.min_by(
                F.struct(F.col("__utok"), F.col("__vr")),
                F.struct(-F.col("__jw"), F.col("__utok")),
            ).alias("__bu"),
        )
        .where(F.col("__bjw") >= F.lit(threshold))
    )
    contrib = best.select(
        id_l,
        id_r,
        (F.col("__vl") * F.col("__bu.__vr") * F.col("__bjw")).alias("__c"),
    )
    sums = contrib.groupBy(id_l, id_r).agg(F.sum("__c").alias("soft_tfidf"))
    return (
        pairs.select(id_l, id_r)
        .distinct()
        .join(sums, [id_l, id_r], "left")
        .select(
            id_l,
            id_r,
            F.coalesce(F.col("soft_tfidf"), F.lit(0.0)).alias("soft_tfidf"),
        )
    )


def soft_tfidf_symmetric(
    pairs: DataFrame,
    records: DataFrame,
    *,
    threshold: float = 0.9,
    **kw,
) -> DataFrame:
    """Mean of the two directed SoftTFIDF scores — a symmetric variant
    (the paper's score is directional)."""
    id_l = kw.get("id_l", "record_id_l")
    id_r = kw.get("id_r", "record_id_r")
    fwd = soft_tfidf_pairs(pairs, records, threshold=threshold, **kw)
    flipped = pairs.select(
        F.col(id_r).alias(id_l), F.col(id_l).alias(id_r)
    )
    bwd = soft_tfidf_pairs(flipped, records, threshold=threshold, **kw).select(
        F.col(id_l).alias(id_r), F.col(id_r).alias(id_l), "soft_tfidf"
    )
    return (
        fwd.withColumnRenamed("soft_tfidf", "__f")
        .join(bwd.withColumnRenamed("soft_tfidf", "__b"), [id_l, id_r])
        .select(
            id_l,
            id_r,
            ((F.col("__f") + F.col("__b")) / 2).alias("soft_tfidf"),
        )
    )
