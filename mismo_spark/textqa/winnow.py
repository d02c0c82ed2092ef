"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003).

Whole-document fingerprints (``mismo_spark/textqa.fingerprint``) miss
partial overlap; full positional k-gram indexes (``textqa/spans.py``)
keep EVERY window.  Winnowing is the middle path with a guarantee: from
the per-document sequence of token k-gram hashes, slide a window of
``w`` consecutive hashes and keep each window's minimum (rightmost
occurrence on ties).  The selected set is ~``2/(w+1)`` of all k-grams,
yet any shared token run of length ≥ ``w + k - 1`` between two
documents is guaranteed to share at least one selected fingerprint —
so the fingerprint equi-join is a recall-guaranteed candidate
generator for partial-overlap / quotation detection, unlike MinHash
(probabilistic) at a fraction of the index size of ExactSubstr.

Spark plan shape (no UDFs):
  1. posexplode of positional k-gram md5 digests — (id, pos, hash)
     rows only ride the exchange, never token arrays
  2. sliding-window minimum via a ROWS BETWEEN CURRENT ROW AND w-1
     FOLLOWING frame partitioned BY DOCUMENT (positions are dense, so
     the ROWS frame is exact) — per-doc state only
  3. distinct selected (id, pos, fp) rows

The rightmost-on-ties rule rides inside the single window pass: the
ordering key is ``md5hex || lpad(10^9 - pos)``, so the frame minimum
is (smallest hash, then LARGEST position) with plain string min — one
window function, replayable verbatim in ANSI SQL / DuckDB.

Hashes are md5 hex (cross-engine, same convention as
``linker/lsh.py`` md5 mode); the 128-bit space makes collisions moot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark.text.features import tokenize

# positions are offsets into a document's token list; 10^9 tokens per
# document is far beyond any real page and keeps the inverted-position
# pad at a fixed 10 digits
_POS_CEIL = 1_000_000_000


def _order_key(h: Column, pos: Column) -> Column:
    """Sortable string whose min is (min hash, then max position)."""
    inv = F.lpad((F.lit(_POS_CEIL) - pos).cast("string"), 10, "0")
    return F.concat(h, inv)


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ DataFrame(id_col, pos, fp): the winnowing sketch of each
    document over lowercase whitespace tokens.

    ``fp`` is the md5 hex digest of the k-token gram starting at token
    offset ``pos`` (0-based).  Any two documents sharing a token run of
    length ≥ ``w + k - 1`` share at least one (fp) value — the
    winnowing guarantee.  Documents with fewer than ``k + w - 1``
    tokens emit nothing (they have no full window).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    toks = docs.select(
        F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")
    )
    # docs without a full window (size < k + w - 1) must emit nothing:
    # handled by the empty index array + the pos <= __nh - w filter
    # below, NOT a .where on the computed token column (that filter
    # would push below the projection and re-evaluate tokenize per
    # row).  Gram build keeps only get/concat inside the interpreted
    # HOF lambda; the md5 runs AFTER the explode in codegen, via
    # posexplode_outer so no inferred size-filter duplicates the
    # expression (see _util.explode_computed).
    sz = F.size("__toks")
    idx = F.when(sz >= k + w - 1, F.sequence(F.lit(0), sz - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get("__toks", i + F.lit(j)) for j in range(k)]
        ),
    )
    hashes = (
        toks.select(
            id_col,
            (sz - k + 1).alias("__nh"),
            F.posexplode_outer(grams).alias("pos", "__g"),
        )
        .where(F.col("__g").isNotNull())
        .select(id_col, "__nh", "pos", F.md5("__g").alias("__h"))
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    selected = (
        hashes.withColumn(
            "__sel", F.min(_order_key(F.col("__h"), F.col("pos"))).over(win)
        )
        # keep only full windows (the frame shrinks at the tail)
        .where(F.col("pos") <= F.col("__nh") - w)
        .select(id_col, F.col("__sel"))
        .distinct()
    )
    return selected.select(
        id_col,
        (F.lit(_POS_CEIL) - F.substring("__sel", 33, 10).cast("long")).alias(
            "pos"
        ),
        F.substring("__sel", 1, 32).alias("fp"),
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
) -> DataFrame:
    """→ DataFrame(id_l, id_r, n_shared): unordered document pairs
    sharing ≥1 winnowing fingerprint, with the count of distinct
    shared fingerprint VALUES.

    The fingerprint equi-join is the candidate generator: recall 1.0
    for any overlap of ≥ ``w + k - 1`` tokens.  ``max_df`` drops
    fingerprints selected by more than that many documents before the
    self-join — boilerplate grams (headers, licence blurbs) are the
    skew hot keys at corpus scale, and a fingerprint shared by d
    documents alone would emit d² pairs.  Dropped fingerprints weaken
    the guarantee only for runs WHOLLY inside boilerplate; pass
    ``max_df=None`` to keep strict recall.
    """
    fps = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    ).select(F.col(id_col).alias("__id"), "fp").distinct()
    if max_df is not None:
        ok = fps.groupBy("fp").agg(F.count("*").alias("__df")).where(
            F.col("__df") <= max_df
        )
        fps = fps.join(ok.select("fp"), "fp", "left_semi")
    left = fps.select(F.col("__id").alias("id_l"), "fp")
    right = fps.select(F.col("__id").alias("id_r"), "fp")
    return (
        left.join(right, "fp")
        .where(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.count("*").alias("n_shared"))
    )
