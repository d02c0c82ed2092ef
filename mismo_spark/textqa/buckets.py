"""CCNet-style quality bucketing — split a scored corpus into
head/middle/tail tiers per group (Wenzek et al. 2020, §4.3: documents
are tiered by target-LM perplexity WITHIN each language, and training
mixes draw mostly from the head).  The stage that sits after
``textqa.lm``'s perplexity screen and before ``mix.training_mix``.

Plan shape: cut points come from ONE exact ``percentile`` aggregation
per group (a groupBy over ≤|groups| rows out, broadcastable by
construction), joined back and compared — so the corpus is never
window-sorted.  A ``percent_rank`` window over each language partition
would need a full sort of every partition AND put the whole language
on one task (the classic mega-partition trap: English is half of
Common Crawl); the cutpoint join keeps the corpus pass embarrassingly
parallel and the only shuffle is the percentile aggregation's map-side
combined one.

Contract (replayed by the DuckDB oracle, which computes the same cut
points with ``quantile_cont`` — Spark's exact ``percentile`` uses the
same linear interpolation):
* ``cuts=(c1, …, ck)`` ascending in (0,1) → k+1 buckets labeled
  ``0..k`` (0 = best = LOWEST scores when ``ascending`` — perplexity
  convention: head is low perplexity);
* a document lands in bucket i when
  ``cut_{i-1} < score ≤ cut_i`` (ties go DOWN into the better tier,
  matching ``quantile_cont`` boundary inclusion);
* NULL scores get NULL bucket (unknown quality is not "tail");
* with ``labels`` (len k+1), the label column replaces the index.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_cutpoints(
    docs: DataFrame,
    score_col: str,
    *,
    by: Sequence[str] = (),
    cuts: Sequence[float] = (1 / 3, 2 / 3),
) -> DataFrame:
    """→ (…by, cut_1..cut_k): exact linear-interpolation percentiles of
    ``score_col`` per group — ≤|groups| rows, broadcastable."""
    if not cuts or list(cuts) != sorted(cuts) or cuts[0] <= 0 or cuts[-1] >= 1:
        raise ValueError(f"cuts must be ascending in (0, 1), got {cuts!r}")
    aggs = [
        F.percentile(F.col(score_col), F.lit(float(c))).alias(f"cut_{i + 1}")
        for i, c in enumerate(cuts)
    ]
    if by:
        return docs.groupBy(*by).agg(*aggs)
    return docs.agg(*aggs)


def quality_buckets(
    docs: DataFrame,
    score_col: str,
    *,
    by: Sequence[str] = (),
    cuts: Sequence[float] = (1 / 3, 2 / 3),
    labels: Sequence[str] | None = None,
    ascending: bool = True,
    out_col: str = "bucket",
) -> DataFrame:
    """→ ``docs`` + ``out_col``: per-group percentile tier of
    ``score_col`` (defaults = CCNet head/middle/tail terciles when
    ``labels=("head","middle","tail")``).

    ``ascending=True`` ranks low scores best (perplexity); pass
    ``False`` for higher-is-better scores (quality_score) — same cut
    points, flipped strict comparison (ties still land in the better
    tier)."""
    if labels is not None and len(labels) != len(cuts) + 1:
        raise ValueError(
            f"labels needs {len(cuts) + 1} entries for {len(cuts)} cuts, "
            f"got {len(labels)}"
        )
    cp = score_cutpoints(docs, score_col, by=by, cuts=cuts)
    if by:
        # null-SAFE group join: groupBy emits a cutpoint row for the
        # NULL group key, but a plain equi-join would never match it —
        # silently bucketing every NULL-group doc as NULL (and a
        # downstream "keep bucket 0" filter would drop them all)
        cpr = cp
        for c in by:
            cpr = cpr.withColumnRenamed(c, f"__cp_{c}")
        cond = None
        for c in by:
            e = docs[c].eqNullSafe(cpr[f"__cp_{c}"])
            cond = e if cond is None else (cond & e)
        joined = docs.join(F.broadcast(cpr), cond, "left").drop(
            *[f"__cp_{c}" for c in by]
        )
    else:
        joined = docs.crossJoin(F.broadcast(cp))
    s = F.col(score_col)
    # bucket = number of cut points strictly below the score (ties go
    # to the better tier via <=); descending flips the comparison
    idx = sum(
        (
            (s > F.col(f"cut_{i + 1}")) if ascending else (s < F.col(f"cut_{i + 1}"))
        ).cast("int")
        for i in range(len(cuts))
    )
    bucket = F.when(s.isNull(), F.lit(None).cast("int")).otherwise(idx)
    if labels is not None:
        arr = F.array(*[F.lit(x) for x in labels])
        bucket = F.when(bucket.isNull(), F.lit(None).cast("string")).otherwise(
            F.get(arr, bucket)
        )
    return joined.select(*docs.columns, bucket.alias(out_col))
