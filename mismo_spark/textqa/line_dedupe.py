"""Corpus-level line deduplication — the cross-document step of
C4 (Raffel et al. 2020, §2.2 "we discard all but one of any
three-sentence span occurring more than once") as practiced line-wise
by RefinedWeb/Dolma: any line repeated across the corpus is boilerplate
(navigation, cookie banners, licence footers) and every occurrence but
the FIRST is removed.

This complements ``clean.c4_clean_lines`` (within-document heuristics)
and ``spans.duplicated_token_spans`` (within-corpus token windows):
here the unit is the exact line and the scope is the whole corpus.

Spark plan shape (no UDFs, skew-proof by construction):
  1. posexplode lines → (id, line_no, md5 key) — text never rides the
     key shuffle, only 32-char digests
  2. per-key stats: ONE groupBy computing the occurrence count and the
     first occurrence as ``min(struct(id, line_no))`` — an aggregation
     with map-side partial combine, so a line occurring 10^8 times
     ("Home") never lands on one reducer the way a per-key window
     row_number would
  3. keep rule joined back on the digest; reconstruction is one
     per-document groupBy (sort_array of (line_no, line) structs)

Lines with fewer than ``min_words`` whitespace tokens are exempt —
never counted, never removed (RefinedWeb's "sufficiently long line"
rule); this also keeps blank separator lines intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed


def duplicated_lines(
    docs: DataFrame,
    *,
    min_words: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ DataFrame(line_key, n_occurrences, n_docs, example): corpus
    boilerplate inventory — every eligible line (≥ ``min_words``
    words after trim) occurring ≥ ``min_count`` times, keyed by the
    md5 of its trimmed text, with one deterministic example (the
    lexicographically smallest raw form)."""
    lines = explode_computed(
        docs.where(F.col(text_col).isNotNull()),
        [F.col(id_col).alias("__id")],
        F.split(F.col(text_col), "\n"),
        "line",
    )
    eligible = lines.where(
        F.size(F.split(F.trim("line"), r"\s+")) >= min_words
    ).withColumn("line_key", F.md5(F.trim("line")))
    return (
        eligible.groupBy("line_key")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("__id").alias("n_docs"),
            F.min(F.trim("line")).alias("example"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def corpus_line_dedupe(
    docs: DataFrame,
    *,
    min_words: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``docs`` with ``text_col`` rewritten: for every eligible line
    occurring ≥ ``min_count`` times corpus-wide, all occurrences but
    the first (smallest (id, line_no)) are dropped.  Adds
    ``n_lines_removed``.  Ineligible lines (< ``min_words`` words)
    always survive; NULL text stays NULL.

    The keep rule is computed as ONE aggregation per line digest —
    ``min(struct(id, line_no))`` with map-side combine — so corpus-hot
    boilerplate lines cannot skew a reducer.
    """
    other_cols = [c for c in docs.columns if c != text_col]
    lines = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_no", "line"
        ),
    )
    lines = lines.withColumn(
        "__key",
        F.when(
            F.size(F.split(F.trim("line"), r"\s+")) >= min_words,
            F.md5(F.trim("line")),
        ),
    )
    stats = (
        lines.where(F.col("__key").isNotNull())
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col("__id"), F.col("line_no"))).alias("__first"),
        )
        .where(F.col("__n") >= min_count)
    )
    marked = lines.join(stats, "__key", "left").withColumn(
        "__keep",
        F.col("__n").isNull()
        | (
            (F.col("__first.__id") == F.col("__id"))
            & (F.col("__first.line_no") == F.col("line_no"))
        ),
    )
    rebuilt = marked.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("line_no"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__clean"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias(
            "n_lines_removed"
        ),
    )
    return (
        docs.join(
            rebuilt.withColumnRenamed("__id", id_col), id_col, "left"
        )
        .select(
            *other_cols,
            F.when(F.col(text_col).isNull(), F.lit(None))
            .otherwise(F.col("__clean"))
            .alias(text_col),
            F.coalesce(F.col("n_lines_removed"), F.lit(0))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )
