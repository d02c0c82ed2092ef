"""Okapi BM25 scoring and top-k retrieval over a tokenized corpus.

Beyond the reference (mismo has TF-IDF, mismo/sets/_tfidf.py:11-315, but
no ranked retrieval); BM25 is the standard lexical scorer a
training-data pipeline needs for decontamination lookups, dedup triage,
and query-based corpus slicing (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond").

Plan shape, built for 10^12 docs:

* Corpus statistics are two aggregations over ONE explode of the terms
  column: per-(doc, term) tf (shuffle on (doc, term), partial-agg) and
  per-term document frequency (re-aggregated from tf, so the corpus is
  tokenized exactly once).
* The query set is broadcast — scoring is a broadcast equi-join of the
  exploded query terms against the (doc, term, tf) relation, then one
  groupBy (query, doc).  Only documents sharing a term with a query are
  ever touched; no per-pair dense math, no crossJoin.
* ``bm25_topk`` ranks with a per-query window — Spark pushes the
  row_number filter into WindowGroupLimit, so each shuffle partition
  keeps k rows per query before the final merge.
* idf uses the Lucene/Robertson form ln(1 + (N - df + .5)/(df + .5)),
  which is positive for every df, so scores are monotone in tf and safe
  to sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark._util import bind_one


def _doc_term_stats(
    docs: DataFrame, terms_column, *, id_column: str = "record_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (tf, df, doclen): per-(doc, term) counts, per-term document
    frequency, per-doc token length — all from one explode."""
    terms = bind_one(docs, terms_column)
    exploded = docs.select(
        F.col(id_column), F.explode(terms).alias("term")
    )
    tf = (
        exploded.groupBy(id_column, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = tf.groupBy(id_column).agg(F.sum("tf").alias("dl"))
    return tf, df, doclen


def bm25_scores(
    docs: DataFrame,
    terms_column,
    queries: DataFrame,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_column: str = "record_id",
    query_id: str = "query_id",
    query_terms: str = "terms",
) -> DataFrame:
    """BM25 score of every (query, document) pair sharing ≥1 term.

    ``queries`` is a small DataFrame (query_id, terms array) — it is
    broadcast.  Returns (query_id, <id_column>, score).
    """
    n_docs = docs.count()
    tf, dfreq, doclen = _doc_term_stats(docs, terms_column, id_column=id_column)
    avgdl = doclen.agg(F.avg("dl")).collect()[0][0] or 1.0

    idf = dfreq.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    qterms = queries.select(
        F.col(query_id), F.explode(F.array_distinct(F.col(query_terms))).alias("term")
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(idf, "term")
        .join(doclen, id_column)
        .select(
            query_id,
            id_column,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("part"),
        )
        .groupBy(query_id, id_column)
        .agg(F.sum("part").alias("score"))
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    terms_column,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_column: str = "record_id",
    query_id: str = "query_id",
    query_terms: str = "terms",
) -> DataFrame:
    """Top-k documents per query by BM25, deterministic tie-break on
    the document id.  → (query_id, <id_column>, score, rank)."""
    scored = bm25_scores(
        docs,
        terms_column,
        queries,
        k1=k1,
        b=b,
        id_column=id_column,
        query_id=query_id,
        query_terms=query_terms,
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.col(id_column)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
