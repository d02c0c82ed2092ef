"""Exact-substring duplicated-SPAN detection and removal, token level.

The whole-document dedupers (``mismo_spark/dedupe``) drop documents;
this module finds the duplicated REGIONS inside otherwise-unique
documents — Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" (ExactSubstr): any token window of length ``n``
whose content occurs at least ``min_count`` times in the corpus marks
its positions as duplicated; overlapping/adjacent marks merge into
maximal spans that can be scored or cut out.

Spark plan shape (no UDFs, no suffix array — the distributed
approximation trades the suffix automaton for one extra explode):
  1. per doc: posexplode of n-gram HASHES with their token offset —
     strings never ride an exchange, only (id, pos, int64) rows
  2. corpus occurrence counts: one groupBy on the hash (map-side
     partial agg); duplicated hashes are joined back (shuffle on hash)
  3. interval merge per document: the classic gaps-and-islands pair of
     windows, both partitioned BY DOCUMENT — per-doc state only, so
     the merge scales with the longest document, not the corpus.

Identity is 64-bit-hash-based: two different n-grams colliding under
xxhash64 would be treated as the same substring (same documented
tradeoff as ``duplicated_ngram_fraction``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark.text.features import tokenize


def _positional_gram_hashes(
    docs: DataFrame, *, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, __h): xxhash64 of the n token(s) starting at 0-based
    token offset ``pos``.  Documents shorter than ``n`` tokens emit
    nothing (they have no length-n window — unlike ``doc_ngrams``,
    which falls back to the whole string for minhash composability)."""
    toks = docs.select(
        F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")
    )
    # short docs get an EMPTY index array instead of a .where(size>=n)
    # — a filter on the computed column would push below the projection
    # and re-evaluate tokenize per row; likewise the gram build keeps
    # only cheap get/concat inside the (interpreted) HOF lambda and
    # hashes AFTER the explode in whole-stage codegen, via
    # posexplode_outer so no inferred size-filter duplicates the
    # expression (see _util.explode_computed)
    sz = F.size("__toks")
    idx = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get("__toks", i + F.lit(j)) for j in range(n)]
        ),
    )
    return (
        toks.select(id_col, F.posexplode_outer(grams).alias("pos", "__g"))
        .where(F.col("__g").isNotNull())
        .select(id_col, "pos", F.xxhash64("__g").alias("__h"))
    )


def duplicated_token_spans(
    docs: DataFrame,
    *,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    → (id_col, span_start, span_end, span_tokens): 0-based INCLUSIVE
    token offsets; a position is duplicated when some length-``n``
    window covering it occurs >= ``min_count`` times across the corpus
    (within-document repeats count).  Overlapping or adjacent windows
    merge into one span, so spans never overlap and each is maximal.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    sh = _positional_gram_hashes(docs, n=n, id_col=id_col, text_col=text_col)
    counts = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    dup = sh.join(
        counts.where(F.col("__cnt") >= min_count).select("__h"), "__h"
    ).select(id_col, "pos")

    by_doc = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n - 1).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.select(
        id_col,
        "pos",
        F.when(prev_end >= F.col("pos") - 1, F.lit(0))
        .otherwise(F.lit(1))
        .alias("__new"),
    )
    island = F.sum("__new").over(
        by_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    *,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ one row per document: (id, n_tokens, n_spans, dup_tokens,
    dup_token_frac) — coverage of merged duplicated spans.  Documents
    with no spans (or shorter than ``n``) report zeros."""
    spans = duplicated_token_spans(
        docs, n=n, min_count=min_count, id_col=id_col, text_col=text_col
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    base = docs.select(
        F.col(id_col),
        F.size(tokenize(F.lower(F.col(text_col)))).alias("n_tokens"),
    )
    joined = base.join(per_doc, id_col, "left")
    n_spans = F.coalesce("n_spans", F.lit(0))
    dup_tokens = F.coalesce("dup_tokens", F.lit(0))
    return joined.select(
        id_col,
        "n_tokens",
        n_spans.alias("n_spans"),
        dup_tokens.alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(dup_tokens.cast("double") / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )


def remove_duplicated_spans(
    docs: DataFrame,
    *,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "text_deduped",
) -> DataFrame:
    """Rewrite each document with its duplicated spans cut out.

    Adds ``out``: the surviving tokens rejoined with single spaces
    (whitespace is normalized — the tokenizer's contract), all other
    columns untouched.  The span table is aggregated to one
    array<struct> per affected document and joined back once; the cut
    itself is a two-arg ``F.filter`` over (token, index) — pure column
    algebra, whole-stage codegen, per-row work O(tokens x spans)."""
    spans = duplicated_token_spans(
        docs, n=n, min_count=min_count, id_col=id_col, text_col=text_col
    )
    span_arrays = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = docs.join(span_arrays, id_col, "left")
    toks = tokenize(F.lower(F.col(text_col)))
    spans_col: Column = F.coalesce(
        "__spans",
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    kept = F.filter(
        toks,
        lambda tok, i: ~F.exists(
            spans_col,
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return joined.withColumn(out, F.array_join(kept, " ")).drop("__spans")
