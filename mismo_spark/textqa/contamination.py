"""Benchmark decontamination and boilerplate n-gram analysis.

Two standard web-scale training-data curation steps (not in the
reference — mismo is record linkage — but first-class here, like the
rest of ``textqa``):

* :func:`ngram_contamination` — per-document overlap with an
  evaluation/benchmark set's word n-grams (the GPT-3/PaLM-style
  "13-gram decontamination" filter).
* :func:`duplicated_ngram_fraction` — fraction of each document's
  distinct n-grams that appear in ≥ ``min_df`` documents (the
  CCNet/RefinedWeb-style boilerplate signal: navigation chrome, legal
  footers, templated spam score high).

Scale shape: everything reduces to an exploded, DISTINCT-per-doc
(doc, xxhash64(n-gram)) stream of 16-byte rows — the n-gram strings
themselves never ride an exchange.  Contamination is a broadcast
map-side join (an eval suite is small by definition) plus ONE shuffle
(the per-doc groupBy).  Boilerplate is the canonical explode →
groupBy-count → join-back → groupBy-doc: three shuffles of hashed
rows, map-side partial aggregation on each, no skew beyond what AQE
handles (a universal n-gram is one hot *count* row, never a gathered
neighbourhood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed
from mismo_spark.dedupe import word_shingles_from_tokens
from mismo_spark.text.features import tokenize


def doc_ngrams(
    docs: DataFrame,
    *,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, ngram) — each document's DISTINCT lowercase word
    n-grams, one row each.  Documents shorter than ``n`` tokens yield
    their whole token string as a single n-gram (same convention as
    the minhash shingler, so the two compose).

    Tokens are materialized in a separate select before the shingle
    lambda touches them (HOF lambdas re-evaluate referenced
    expressions per element — see word_shingles_from_tokens).
    """
    toks = docs.select(
        F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")
    )
    return explode_computed(
        toks,
        [id_col],
        F.array_distinct(word_shingles_from_tokens(F.col("__toks"), n)),
        "ngram",
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """→ (id_col, n_ngrams, n_contaminated, contamination_frac) per doc.

    ``benchmark`` is the evaluation corpus to decontaminate against
    (column ``bench_text_col``, default = ``text_col``).  Its distinct
    n-gram hashes are broadcast — eval suites are thousands of
    documents, so the hash set is a few MB against a 100 TB corpus —
    and the corpus stream is tagged map-side; the only shuffle is the
    per-document count aggregation.  Filter on ``contamination_frac``
    (or ``n_contaminated > 0`` for the strict GPT-3 rule) downstream.
    """
    bench_text = bench_text_col or text_col
    bench_hashes = (
        doc_ngrams(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text)),
            n=n,
            id_col="__bid",
            text_col=bench_text,
        )
        .select(F.xxhash64("ngram").alias("__h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    grams = doc_ngrams(docs, n=n, id_col=id_col, text_col=text_col).select(
        id_col, F.xxhash64("ngram").alias("__h")
    )
    tagged = grams.join(F.broadcast(bench_hashes), "__h", "left")
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            / F.count(F.lit(1))
        ).alias("contamination_frac"),
    )


def duplicated_ngram_fraction(
    docs: DataFrame,
    *,
    n: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, n_ngrams, n_duplicated, duplicated_frac) per doc:
    how much of the document is made of n-grams that occur in at least
    ``min_df`` documents (n-grams are distinct per doc, so document
    frequency = plain count).  High fractions flag boilerplate /
    templated pages; near-1.0 with a moderate corpus df usually means
    mirrored content the whole-doc dedupers miss.
    """
    grams = doc_ngrams(docs, n=n, id_col=id_col, text_col=text_col).select(
        id_col, F.xxhash64("ngram").alias("__h")
    )
    df_counts = grams.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    joined = grams.join(df_counts, "__h")
    dup = (F.col("__df") >= min_df).cast("long")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(dup).alias("n_duplicated"),
        (F.sum(dup) / F.count(F.lit(1))).alias("duplicated_frac"),
    )
