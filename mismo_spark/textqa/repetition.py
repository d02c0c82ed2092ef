"""Within-document repetition signals — the Gopher/MassiveText-style
quality filters (Rae et al. 2021, §A1.1: repetitious documents are
low-quality and over-weighted by LMs; no reference counterpart — this
is the training-data side of the engine, next to
``textqa.contamination``'s cross-document signals).

Two plan shapes, chosen per signal family:

* **Line signals** (`dup_line_fraction`, `dup_line_char_fraction`) are
  pure array algebra on each row — sort the line array once, mark
  occurrences equal to their sorted predecessor — so they run
  shuffle-free inside the scan's codegen stage.  At 100 TB this is the
  difference between a map-only pass and an explode of every line.
* **N-gram signals** (`ngram_repetition_signals`: most-frequent-n-gram
  char fraction and duplicated-n-gram char fraction) need per-(doc,
  gram) counts; explode → groupBy is the right plan (map-side partial
  aggregation; one shuffle keyed by doc — never cross-document).

Token/char accounting (documented contract, replayed verbatim by the
DuckDB oracle):
* lines = ``split(text, '\\n')`` with blank (all-space) lines dropped;
* a "duplicate line" is the 2nd+ occurrence of an identical line;
  char fractions weight by line length, Σ(c−1)·len / Σ c·len;
* n-grams are over :func:`mismo_spark.text.features.tokenize` tokens
  joined by one space; the top-gram fraction is
  ``max_count · len(gram) / len(' '-joined tokens)`` with
  lexicographic-smallest tie-break; the duplicated-gram fraction sums
  ``c · len(gram)`` over grams with c ≥ 2 (overlapping occurrences
  counted fully, as in the Gopher appendix) and is capped at 1.0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed
from mismo_spark.text.features import tokenize


def _word_grams(toks: Column, n: int) -> Column:
    """Strict word n-grams (' '-joined); fewer than n tokens → [].
    ``toks`` must be a materialized attribute, not an inline expression
    (HOF lambdas re-evaluate referenced expressions per element — see
    dedupe.word_shingles_from_tokens).

    Built with per-index ``F.get`` lookups, not ``F.slice`` — HOF
    lambda bodies run interpreted, and the slice form measured ~6×
    slower at identical output (all gets are in range because the
    index sequence stops at size−n, so concat_ws never drops a null)."""
    sz = F.size(toks)
    idx = F.sequence(F.lit(0), sz - F.lit(n))
    return F.when(sz < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.get(toks, i + F.lit(k)) for k in range(n)]),
        )
    )


def _nonblank_lines(text: Column, sep: str = "\n") -> Column:
    return F.filter(F.split(text, sep), lambda x: F.trim(x) != "")


def dup_line_fraction(text: Column, *, sep: str = "\n") -> Column:
    """Fraction of non-blank lines that are repeats of an earlier
    identical line; 0.0 for docs with no lines; NULL for NULL text.
    ``sep="\\n\\n"`` gives the PARAGRAPH variant (Gopher screens both)."""
    lines = _nonblank_lines(text, sep)
    n = F.size(lines)
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(n == 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(lines))) / n.cast("double")
        )
    )


def dup_line_char_fraction(text: Column, *, sep: str = "\n") -> Column:
    """Fraction of line characters sitting in duplicate occurrences:
    Σ_(distinct line) (count−1)·len / Σ count·len.  Computed
    shuffle-free: sort the line array, an occurrence is a duplicate iff
    it equals its sorted predecessor.  ``sep="\\n\\n"`` = paragraphs."""
    lines = F.array_sort(_nonblank_lines(text, sep))
    n = F.size(lines)
    # zip each line (from the 2nd) with its predecessor; sum lengths of
    # the ones that repeat
    dup_chars = F.aggregate(
        F.zip_with(
            F.slice(lines, 2, F.greatest(n - 1, F.lit(0))),
            F.slice(lines, 1, F.greatest(n - 1, F.lit(0))),
            lambda cur, prev: F.when(cur == prev, F.length(cur)).otherwise(
                F.lit(0)
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(total_chars == 0, F.lit(0.0)).otherwise(
            dup_chars / total_chars.cast("double")
        )
    )


def line_repetition_signals(
    df: DataFrame,
    *,
    id_col: str = "record_id",
    text_col: str = "text",
    paragraphs: bool = False,
) -> DataFrame:
    """→ (id, dup_line_frac, dup_line_char_frac
    [, dup_paragraph_frac, dup_paragraph_char_frac]) — map-only pass;
    ``paragraphs=True`` adds the ``\\n\\n``-delimited variants Gopher
    screens alongside lines (Table A1)."""
    t = F.col(text_col)
    cols = [
        F.col(id_col),
        F.round(dup_line_fraction(t), 9).alias("dup_line_frac"),
        F.round(dup_line_char_fraction(t), 9).alias("dup_line_char_frac"),
    ]
    if paragraphs:
        cols += [
            F.round(dup_line_fraction(t, sep="\n\n"), 9).alias(
                "dup_paragraph_frac"
            ),
            F.round(dup_line_char_fraction(t, sep="\n\n"), 9).alias(
                "dup_paragraph_char_frac"
            ),
        ]
    return df.select(*cols)


def ngram_repetition_signals(
    df: DataFrame,
    *,
    n: int = 2,
    id_col: str = "record_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, top_ngram_char_frac, dup_ngram_char_frac) per document.

    SHUFFLE-FREE (r6 rewrite): the signals are document-local, so the
    per-(doc, gram) counts come from run lengths over the SORTED gram
    array instead of an explode → groupBy → window rollup — the
    previous plan shuffled ~|corpus|·grams (url, gram-string) rows
    twice plus a rejoin for gram-less docs; this one is a single
    map-only projection (measured 4.0 s → 0.45 s over 85k pages,
    bit-identical output on every row).  The sorted array makes the
    (count DESC, gram ASC) tie-break free: the first run with the
    maximum count is the lexicographically smallest such gram.  Docs
    with fewer than ``n`` tokens (or NULL text) get 0.0 for both
    signals, as before.  One output row per input row — callers supply
    one row per document (both in-repo callers key by a unique id).

    Every intermediate column is wrapped in
    :func:`mismo_spark._util.optimizer_barrier`: the run-length chain
    references each previous level as an ATTRIBUTE inside HOF lambdas,
    and a caller filtering on the output (e.g. the curation job's
    ``dup_ngram_char_frac > t`` screen) would otherwise have predicate
    pushdown substitute the full expression tree into those lambdas —
    re-evaluated per array element, nested across four levels, the
    filter never finishes even on 500 rows.  The barrier pins each
    level to one evaluation per row; values are bit-identical.
    """
    from mismo_spark._util import optimizer_barrier as _ob

    base = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(
            tokenize(F.col(text_col)), F.array().cast("array<string>")
        ).alias("__toks"),
    ).select(
        "__id",
        F.length(F.array_join(F.col("__toks"), " ")).alias("__text_len"),
        _ob(F.array_sort(_word_grams(F.col("__toks"), n))).alias("__sg"),
    )
    sg = F.col("__sg")
    sz = F.size(sg)
    # run starts: index 0 plus every position whose gram differs from
    # its predecessor (get(sg, -1) is NULL, and (i==0)|NULL is true)
    starts = F.filter(
        F.sequence(F.lit(0), sz - 1),
        lambda i: (i == 0) | (F.get(sg, i) != F.get(sg, i - 1)),
    )
    base = base.withColumn(
        "__starts",
        _ob(F.when(sz > 0, starts).otherwise(F.array().cast("array<int>"))),
    )
    st = F.col("__starts")
    nst = F.size(st)
    runs = F.transform(
        F.sequence(F.lit(0), nst - 1),
        lambda j: F.struct(
            (F.coalesce(F.get(st, j + 1), sz) - F.get(st, j)).alias("c"),
            F.get(sg, F.get(st, j)).alias("g"),
        ),
    )
    base = base.withColumn(
        "__runs",
        _ob(
            F.when(nst > 0, runs).otherwise(
                F.array().cast("array<struct<c:int,g:string>>")
            )
        ),
    )
    rn = F.col("__runs")
    base = base.withColumn(
        "__maxc", _ob(F.array_max(F.transform(rn, lambda r: r.getField("c"))))
    )
    maxc = F.col("__maxc")
    top = F.get(F.filter(rn, lambda r: r.getField("c") == maxc), 0)
    base = base.withColumn(
        "__top_chars", _ob(top.getField("c") * F.length(top.getField("g")))
    )
    dup_chars = F.aggregate(
        rn,
        F.lit(0),
        lambda acc, r: acc
        + F.when(
            r.getField("c") >= 2, r.getField("c") * F.length(r.getField("g"))
        ).otherwise(0),
    )
    base = base.withColumn("__dup_chars", _ob(dup_chars))
    tl = F.col("__text_len")
    return base.select(
        F.col("__id").alias(id_col),
        F.when((sz == 0) | (tl == 0), F.lit(0.0))
        .otherwise(F.round(F.col("__top_chars") / tl.cast("double"), 9))
        .alias("top_ngram_char_frac"),
        F.when((sz == 0) | (tl == 0), F.lit(0.0))
        .otherwise(
            F.round(
                F.least(F.col("__dup_chars") / tl.cast("double"), F.lit(1.0)),
                9,
            )
        )
        .alias("dup_ngram_char_frac"),
    )


def multi_ngram_repetition_signals(
    df: DataFrame,
    *,
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
    top_min_count: int = 1,
    id_col: str = "record_id",
    text_col: str = "text",
) -> DataFrame:
    """The FULL Gopher A1.1 repetition battery in ONE corpus pass:
    ``top_{n}gram_char_frac`` for each n in ``top_ns`` (most-frequent
    n-gram char fraction) and ``dup_{n}gram_char_frac`` for each n in
    ``dup_ns`` (chars inside n-grams occurring ≥ 2×, capped at 1.0) —
    the paper filters on n ∈ {2,3,4} for the former and {5..10} for
    the latter.

    Plan: every (n, gram) occurrence for ALL n comes out of ONE
    tokenize + ONE generate (per-n gram arrays built with cheap
    ``F.get`` concats, tagged with n, flattened, exploded once), then
    ONE groupBy(id, n, gram) count with map-side combine and ONE
    windowed rollup partitioned by (id, n).  Per-doc work is
    Σ_n (tokens − n + 1) rows — the same volume as running
    :func:`ngram_repetition_signals` once per n, but with one shuffle
    instead of |ns| shuffles and one corpus scan instead of |ns|.
    Char accounting matches :func:`ngram_repetition_signals`
    (documented contract, replayed by the DuckDB oracle)."""
    all_ns = sorted(set(list(top_ns) + list(dup_ns)))
    if not all_ns or any(n < 1 for n in all_ns):
        raise ValueError(f"n values must be >= 1, got {top_ns=} {dup_ns=}")
    toks_df = df.select(
        F.col(id_col).alias("__id"), tokenize(F.col(text_col)).alias("__toks")
    )
    sz = F.size("__toks")

    def _tagged(n: int):
        idx = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.get("__toks", i + F.lit(j)) for j in range(n)]
                ).alias("gram"),
            ),
        )

    base = toks_df.select(
        "__id",
        F.length(F.array_join(F.col("__toks"), " ")).alias("__text_len"),
        F.flatten(F.array(*[_tagged(n) for n in all_ns])).alias("__tagged"),
    )
    counts = (
        explode_computed(base, ["__id", "__text_len"], F.col("__tagged"), "__t")
        .select("__id", "__text_len", F.col("__t.n").alias("__n"), F.col("__t.gram").alias("__g"))
        .groupBy("__id", "__text_len", "__n", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy("__id", "__n")
    rolled = (
        counts.withColumn(
            "__rank",
            F.row_number().over(
                Window.partitionBy("__id", "__n").orderBy(
                    F.desc("__c"), F.asc("__g")
                )
            ),
        )
        .withColumn(
            "__top_chars",
            # top_min_count=2 scores only a REPEATED top gram (a
            # single occurrence is not repetition — without the guard
            # every short document trips the top-4-gram threshold)
            F.max(
                F.when(
                    (F.col("__rank") == 1) & (F.col("__c") >= top_min_count),
                    F.col("__c") * F.length("__g"),
                )
            ).over(w),
        )
        .withColumn(
            "__dup_chars",
            F.sum(
                F.when(F.col("__c") >= 2, F.col("__c") * F.length("__g")).otherwise(0)
            ).over(w),
        )
        .filter(F.col("__rank") == 1)
        .select("__id", "__text_len", "__n", "__top_chars", "__dup_chars")
    )
    safe_len = F.col("__text_len").cast("double")
    top_cols = [
        F.coalesce(
            F.max(
                F.when(
                    (F.col("__n") == n) & (F.col("__text_len") > 0),
                    F.round(F.col("__top_chars") / safe_len, 9),
                )
            ),
            F.lit(0.0),
        ).alias(f"top_{n}gram_char_frac")
        for n in top_ns
    ]
    dup_cols = [
        F.coalesce(
            F.max(
                F.when(
                    (F.col("__n") == n) & (F.col("__text_len") > 0),
                    F.round(
                        F.least(F.col("__dup_chars") / safe_len, F.lit(1.0)), 9
                    ),
                )
            ),
            F.lit(0.0),
        ).alias(f"dup_{n}gram_char_frac")
        for n in dup_ns
    ]
    wide = rolled.groupBy("__id").agg(*top_cols, *dup_cols)
    ids = df.select(F.col(id_col).alias("__id")).distinct()
    out_cols = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    return ids.join(wide, "__id", "left").select(
        F.col("__id").alias(id_col),
        *[F.coalesce(c, F.lit(0.0)).alias(c) for c in out_cols],
    )


# Rae et al. 2021 Table A1 drop thresholds (a doc FAILS when a signal
# EXCEEDS its threshold)
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_paragraph_frac": 0.30,
    "dup_paragraph_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_flags(
    df: DataFrame,
    *,
    id_col: str = "record_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """→ (id, <signal columns>, passes): the COMPLETE Gopher A1.1
    repetition screen — line signals (map-only) joined with the one-pass
    multi-n battery, compared against the paper's Table A1 thresholds
    (override any subset via ``thresholds``).  ``passes`` is true iff
    no signal exceeds its threshold; NULL-text docs get NULL line
    signals and fail the screen (unknown is not clean)."""
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown threshold keys: {sorted(unknown)}")
        th.update(thresholds)
    lines = line_repetition_signals(
        df, id_col=id_col, text_col=text_col, paragraphs=True
    )
    # top_min_count=2: the screen targets REPETITION — a top n-gram
    # occurring once scores 0, else every short document trips the
    # top-4-gram threshold on its longest (single) 4-gram
    grams = multi_ngram_repetition_signals(
        df, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10),
        top_min_count=2, id_col=id_col, text_col=text_col,
    )
    joined = lines.join(grams, id_col)
    ok = None
    for col, cut in th.items():
        this = F.col(col) <= F.lit(cut)
        ok = this if ok is None else (ok & this)
    return joined.select(
        id_col, *th.keys(), F.coalesce(ok, F.lit(False)).alias("passes")
    )
