"""One-to-one link assignment: greedy maximum-weight bipartite matching.

After scoring, many pipelines must enforce that each left record links
to at most one right record and vice versa (deduplicating a merge, or
matching one registry against another where the truth is 1:1).  The
sequential rule is classic greedy matching: walk the scored pairs in a
fixed total order — ``(score DESC, record_id_l ASC, record_id_r ASC)``
— and accept a pair iff both of its records are still unmatched.  This
is the standard post-FS assignment step (Jaro 1989 solves the same 1:1
restriction with an LP; greedy is its scalable 1/2-approximation with
deterministic output) that the reference leaves to the user after
``Linkage.best_match_*`` / ``unambiguous_only``
(mismo/linkage/_linkage.py:248-301 filters one side only; this enforces
both sides jointly).

The distributed form uses the *locally dominant edge* equivalence
(Hoepman 2004, "Simple distributed weighted matchings"; also the basis
of Manne & Bisseling's parallel greedy): under ANY total order on
edges, an edge is accepted by sequential greedy iff it is the order's
minimum among the not-yet-removed edges at BOTH its endpoints.  So each
round accepts every edge that is rank 1 in its left partition AND rank
1 in its right partition (same total order in both windows), drops
every other edge incident to a newly matched record, and repeats on the
remainder.  The result is bit-identical to the sequential scan, round
count ≈ the longest strictly-descending score path (typically < 10; a
tie-broken block of equal scores resolves in O(log) rounds because half
its edges are dominant or removed each round).

Scale shape: each round is two ``row_number`` windows plus two
``max(...) over`` dominance windows — four hash-partition exchanges on
``record_id_l`` / ``record_id_r``, no joins, no driver-side data except
a (count, xxhash) convergence fingerprint.  Lineage is cut per round
exactly like cluster/cc.py (lazy ``localCheckpoint`` or durable parquet
under ``checkpoint_dir`` for resumable long jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R

_DOM = "__dom"
_RN_L = "__rn_l"
_RN_R = "__rn_r"


def _chk(df: DataFrame, checkpoint_dir: str | None, tag: str) -> DataFrame:
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=False)
    path = f"{checkpoint_dir}/{tag}.parquet"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _order(score_col: str):
    return [F.col(score_col).desc(), F.col(ID_L).asc(), F.col(ID_R).asc()]


def mutual_best_links(links: DataFrame, score_col: str) -> DataFrame:
    """Reciprocal-best filter: keep pairs that are the top-ranked link
    of BOTH their records under ``(score DESC, id_l, id_r)``.

    This is exactly round 1 of :func:`one_to_one_links` — a useful
    cheap filter on its own (bioinformatics' "reciprocal best hit"),
    guaranteed 1:1 but not maximal: records whose best partners were
    claimed by better pairs stay unmatched.  Two window exchanges.
    """
    order = _order(score_col)
    w_l = Window.partitionBy(ID_L).orderBy(*order)
    w_r = Window.partitionBy(ID_R).orderBy(*order)
    return (
        links.withColumn(_RN_L, F.row_number().over(w_l))
        .withColumn(_RN_R, F.row_number().over(w_r))
        .filter((F.col(_RN_L) == 1) & (F.col(_RN_R) == 1))
        .drop(_RN_L, _RN_R)
    )


def one_to_one_links(
    links: DataFrame,
    score_col: str,
    *,
    max_rounds: int = 60,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Greedy 1:1 matching over scored links; returns the accepted
    subset of ``links`` (all input columns preserved).

    Bit-identical to the sequential greedy scan in
    ``(score DESC, record_id_l ASC, record_id_r ASC)`` order; see
    module docstring for the locally-dominant-edge argument.  Null
    scores are rejected up front (no total order under NULL).

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted before the
    remainder empties — with the default 60 that means a
    strictly-descending alternating path of ~120 edges, which on real
    similarity scores indicates degenerate input, not a small bound.
    """
    if score_col not in links.columns:
        raise ValueError(f"links has no column {score_col!r}; has {links.columns}")

    order = _order(score_col)
    w_l = Window.partitionBy(ID_L).orderBy(*order)
    w_r = Window.partitionBy(ID_R).orderBy(*order)
    dom_l = Window.partitionBy(ID_L)
    dom_r = Window.partitionBy(ID_R)

    rem = links.filter(F.col(score_col).isNotNull())
    matched: DataFrame | None = None

    for rnd in range(max_rounds):
        # window order matters for the shuffle count: rn_l (hash by l),
        # then BOTH r-partitioned windows back to back (rn_r's exchange
        # satisfies __r_dom's partitioning requirement — no re-shuffle),
        # then the final l-partitioned window: 3 exchanges per round,
        # not the 4 the naive l/r/l/r interleaving costs
        flagged = (
            rem.withColumn(_RN_L, F.row_number().over(w_l))
            .withColumn(_RN_R, F.row_number().over(w_r))
            .withColumn(
                _DOM,
                ((F.col(_RN_L) == 1) & (F.col(_RN_R) == 1)).cast("int"),
            )
            # an edge survives to the next round iff NEITHER of its
            # records gained a dominant (= matched) edge this round
            .withColumn("__r_dom", F.max(_DOM).over(dom_r))
            .withColumn("__l_dom", F.max(_DOM).over(dom_l))
            .filter((F.col(_DOM) == 1) | ((F.col("__l_dom") == 0) & (F.col("__r_dom") == 0)))
        )
        flagged = _chk(
            flagged.drop(_RN_L, _RN_R, "__l_dom", "__r_dom"),
            checkpoint_dir,
            f"one_to_one_round_{rnd}",
        )
        counts = flagged.groupBy(_DOM).count().collect()
        n_rem = sum(r["count"] for r in counts if r[_DOM] == 0)
        round_matched = flagged.filter(F.col(_DOM) == 1).drop(_DOM)
        matched = round_matched if matched is None else matched.unionByName(round_matched)
        if n_rem == 0:
            return matched
        rem = flagged.filter(F.col(_DOM) == 0).drop(_DOM)

    raise RuntimeError(
        f"one_to_one_links did not converge in {max_rounds} rounds; "
        "scores likely form a pathological descending chain"
    )
