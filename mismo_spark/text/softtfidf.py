"""Soft TF-IDF (Cohen, Ravikumar & Fienberg, IIWeb 2003) — the classic
hybrid ER similarity: TF-IDF's rare-token weighting with Jaro-Winkler
forgiveness for per-token typos.  The reference ships the pieces
(tf-idf in `mismo/sets`, JW in `mismo/text`) but not the hybrid.

    sim(S, T) = Σ_{w ∈ S, close(w, T) ≠ ∅}  V(w, S) · V(ŵ, T) · JW(w, ŵ)

where ŵ = argmax_{u ∈ T} JW(w, u) restricted to JW ≥ ``threshold``,
and V is the L2-normalized log-tf·log-idf weight — so "jon smith" vs
"john smith inc" scores high: "jon"≈"john" at JW 0.93 carries both
tokens' idf weight, while the generic "inc" contributes little.

Scale design: weights are ONE explode + two groupBys over the records
table (idf join is a broadcast of the token vocabulary aggregate); the
per-pair token cross-join is bounded by ``max_tokens²`` per pair (the
top-``max_tokens`` heaviest tokens per record, deterministic tie-break
on the token string — pass None only for short fields like names).
JW pairs hit the existing Arrow UDF (identical strings short-circuit
JVM-side).  The final argmax is ``max(struct(jw, w, token))`` per
(pair, left-token) — no window sort — then one sum per pair.

Direction note: the measure is asymmetric by definition (tokens of S
matched INTO T); callers wanting a symmetric score take the mean of
both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.text.similarity import jaro_winkler_similarity


def token_weights(
    records: DataFrame,
    tokens_column: str,
    *,
    id_column: str = "record_id",
    max_tokens: int | None = 8,
) -> DataFrame:
    """→ (id, token, w): L2-normalized log(tf+1)·ln(N/df) weights per
    record, keeping the ``max_tokens`` heaviest tokens (ties broken by
    token string for engine-identical results)."""
    n_docs = records.count()
    tok = records.select(
        F.col(id_column).alias("__id"),
        F.explode(tokens_column).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("__id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    raw = tf.join(F.broadcast(df_t), "token").select(
        "__id",
        "token",
        (
            F.log(F.col("tf") + F.lit(1.0))
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("w_raw"),
    )
    if max_tokens is not None:
        from pyspark.sql import Window

        rn = F.row_number().over(
            Window.partitionBy("__id").orderBy(
                F.col("w_raw").desc(), F.col("token").asc()
            )
        )
        raw = raw.withColumn("__rn", rn).filter(
            F.col("__rn") <= max_tokens
        ).drop("__rn")
    norm = raw.groupBy("__id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("__n")
    )
    return raw.join(norm, "__id").select(
        F.col("__id").alias(id_column),
        "token",
        F.when(F.col("__n") == 0, F.lit(0.0))
        .otherwise(F.col("w_raw") / F.col("__n"))
        .alias("w"),
    )


def soft_tfidf(
    links: DataFrame,
    records: DataFrame,
    tokens_column: str,
    *,
    threshold: float = 0.9,
    id_column: str = "record_id",
    max_tokens: int | None = 8,
) -> DataFrame:
    """→ (record_id_l, record_id_r, soft_tfidf) for each link.  Links
    whose token sets have no close match score 0.0 (row kept)."""
    w = token_weights(
        records, tokens_column, id_column=id_column, max_tokens=max_tokens
    )
    wl = w.select(
        F.col(id_column).alias("record_id_l"),
        F.col("token").alias("tok_l"),
        F.col("w").alias("w_l"),
    )
    wr = w.select(
        F.col(id_column).alias("record_id_r"),
        F.col("token").alias("tok_r"),
        F.col("w").alias("w_r"),
    )
    crossed = (
        links.select("record_id_l", "record_id_r")
        .join(wl, "record_id_l")
        .join(wr, "record_id_r")
        .withColumn(
            "jw", jaro_winkler_similarity(F.col("tok_l"), F.col("tok_r"))
        )
        .filter(F.col("jw") >= F.lit(threshold))
    )
    best = crossed.groupBy("record_id_l", "record_id_r", "tok_l", "w_l").agg(
        F.max(F.struct("jw", "w_r", "tok_r")).alias("__best")
    )
    scored = best.groupBy("record_id_l", "record_id_r").agg(
        F.sum(
            F.col("w_l") * F.col("__best.w_r") * F.col("__best.jw")
        ).alias("soft_tfidf")
    )
    return (
        links.select("record_id_l", "record_id_r")
        .join(scored, ["record_id_l", "record_id_r"], "left")
        .select(
            "record_id_l",
            "record_id_r",
            F.coalesce("soft_tfidf", F.lit(0.0)).alias("soft_tfidf"),
        )
    )
