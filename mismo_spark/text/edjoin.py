"""Edit-distance similarity join — exact Levenshtein-threshold dedupe
pairs via q-gram prefix filtering (Ed-Join: Xiao, Wang, Lin, VLDB'08;
q-gram filters: Gravano et al., VLDB'01).

The edit-distance sibling of ``sets/ssjoin.prefix_filter_pairs``: for
short string fields (names, titles, street lines, product codes) where
token-set Jaccard is too coarse, find ALL pairs with
``levenshtein ≤ max_distance`` without the all-pairs product and with
recall 1.0 — no LSH tuning, no false negatives.

Filter theory (why the plan is exact):
* strings are padded with q−1 sentinel chars on each side, so a string
  of length L yields L + q − 1 positional q-grams and ONE edit
  operation destroys at most q of them;
* therefore d edits destroy at most q·d gram occurrences — hence at
  most q·d DISTINCT gram types — so under ANY global order over grams,
  two strings within distance d must share a gram inside each one's
  prefix of its q·d + 1 rarest distinct grams (Ed-Join Lemma 2 with
  the mismatch bound);
* length filter ``||s|−|t|| ≤ d`` prunes inside the join condition.

Strings with fewer than q·d + 1 DISTINCT grams cannot use the
pigeonhole (all their gram types could be destroyed) — that covers
both genuinely short strings AND longer low-gram-diversity strings
("aaaaaaaa" has 3 distinct padded bigrams).  These route through a
length-bucket fallback join: each low-diversity record explodes to
its 2d+1 candidate partner LENGTHS and equi-joins ALL records on
exact length (no length cap on the partner side — a low-diversity
string's match can be arbitrary, only the ±d length window is
sound).  The fallback's volume is |low-diversity records| × the
matched length buckets; low-diversity strings are rare in natural
key fields, and the exactness of the operator must not depend on a
bound that only holds for short strings.

Like the Jaccard ssjoin, the prefix holds the globally RAREST grams,
so candidate buckets are small by construction (anti-skew without
salting); the global order is realized per record as an
(df, gram)-struct sort — no global rank pass.  Verification is the
JVM built-in ``levenshtein`` (whole-stage codegen) on the narrow
(id, string) table, broadcast under the byte gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one, should_broadcast
from mismo_spark.text.features import ngrams

PAD_CHAR = "\x01"


def _padded_grams(c, *, q: int, pad_char: str = PAD_CHAR):
    """Distinct q-grams of the sentinel-padded string (array<string>);
    every non-null string yields at least one gram."""
    pad = F.lit(pad_char * (q - 1))
    return F.array_distinct(ngrams(F.concat(pad, c, pad), q))


def edit_distance_pairs(
    df: DataFrame,
    string_column,
    *,
    max_distance: int,
    q: int = 2,
    id_col: str = "record_id",
    pad_char: str = PAD_CHAR,
    broadcast_records_max_bytes: int = 512 << 20,
) -> DataFrame:
    """All dedupe pairs with ``levenshtein(s, t) ≤ max_distance``,
    exactly (recall 1.0), without the all-pairs product.

    → (record_id_l, record_id_r, distance), record_id_l < record_id_r.
    Null strings never pair (parity with SQL ``levenshtein`` returning
    NULL).  ``pad_char`` must not occur in the data (default \\x01).
    """
    d = int(max_distance)
    if d < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    s = bind_one(df, string_column)
    if d == 0:
        # exact-equality fast path: one groupBy on the string itself
        recs0 = df.select(F.col(id_col).alias("__id"), s.alias("__s")).where(
            F.col("__s").isNotNull()
        )
        l0, r0 = recs0.alias("l"), recs0.alias("r")
        return (
            l0.join(
                r0,
                on=[
                    F.col("l.__s") == F.col("r.__s"),
                    F.col("l.__id") < F.col("r.__id"),
                ],
            )
            .select(
                F.col("l.__id").alias("record_id_l"),
                F.col("r.__id").alias("record_id_r"),
                F.lit(0).alias("distance"),
            )
        )
    prefix_len = q * d + 1

    recs = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.length(s).alias("__len"),
        _padded_grams(s, q=q, pad_char=pad_char).alias("__grams"),
    ).where(F.col("__s").isNotNull())

    # ---- long path: rarity-ordered q-gram prefix join -------------------
    longs = recs.where(F.size("__grams") >= prefix_len)
    toks = longs.select("__id", "__len", F.explode("__grams").alias("gram"))
    freq = toks.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(freq, "gram")
        .groupBy("__id", "__len")
        .agg(F.array_sort(F.collect_list(F.struct("df", "gram"))).alias("gs"))
    )
    pref = ranked.select(
        "__id",
        "__len",
        F.explode(F.slice("gs", 1, prefix_len)).alias("g"),
    ).select("__id", "__len", F.col("g.gram").alias("gram"))
    l, r = pref.alias("l"), pref.alias("r")
    cand_long = (
        l.join(
            r,
            on=[
                F.col("l.gram") == F.col("r.gram"),
                F.col("l.__id") < F.col("r.__id"),
                F.abs(F.col("l.__len") - F.col("r.__len")) <= F.lit(d),
            ],
        )
        .select(
            F.col("l.__id").alias("record_id_l"),
            F.col("r.__id").alias("record_id_r"),
        )
        .distinct()
    )

    # ---- fallback: length-bucket join for low-gram-diversity strings ----
    # < q·d + 1 DISTINCT grams ⇒ the pigeonhole gives no guarantee, so
    # these records probe ALL records at lengths within ±d (no partner
    # length cap: "aaaaaaaa" is length 8 with only 3 distinct bigrams,
    # and its distance-2 partner "aaaaaa" is length 6 — a cap derived
    # from the gram count would wrongly exclude it)
    shorts = recs.where(F.size("__grams") < prefix_len).select("__id", "__len")
    partners = recs.select(
        F.col("__id").alias("__pid"), F.col("__len").alias("__plen")
    )
    probe = shorts.select(
        "__id",
        F.explode(
            F.sequence(
                F.greatest(F.col("__len") - d, F.lit(0)), F.col("__len") + d
            )
        ).alias("__plen"),
    )
    cand_short = (
        probe.join(partners, "__plen")
        .where(F.col("__id") != F.col("__pid"))
        .select(
            F.least("__id", "__pid").alias("record_id_l"),
            F.greatest("__id", "__pid").alias("record_id_r"),
        )
        .distinct()
    )

    cands = cand_long.unionByName(cand_short).dropDuplicates(
        ["record_id_l", "record_id_r"]
    )

    # ---- verify: JVM levenshtein on the narrow (id, string) table -------
    narrow = recs.select(F.col("__id").alias("__vid"), "__s")
    if should_broadcast(narrow, max_bytes=broadcast_records_max_bytes):
        narrow = F.broadcast(narrow)
    return (
        cands.join(narrow, cands["record_id_l"] == narrow["__vid"])
        .select("record_id_l", "record_id_r", F.col("__s").alias("__sl"))
        .join(narrow, F.col("record_id_r") == narrow["__vid"])
        .select(
            "record_id_l",
            "record_id_r",
            F.levenshtein(F.col("__sl"), F.col("__s")).alias("distance"),
        )
        .where(F.col("distance") <= d)
    )


def edit_distance_link(
    left: DataFrame,
    right: DataFrame,
    left_column,
    right_column=None,
    *,
    max_distance: int,
    q: int = 2,
    id_col: str = "record_id",
    pad_char: str = PAD_CHAR,
    broadcast_records_max_bytes: int = 512 << 20,
) -> DataFrame:
    """Two-table form: all (left, right) pairs with
    ``levenshtein ≤ max_distance`` — same exact filters as
    :func:`edit_distance_pairs` (which covers the self-join/dedupe
    case), with ONE shared global gram order computed over both sides'
    grams so the prefix lemma holds across tables.

    → (record_id_l, record_id_r, distance) — NOT deduplicated to
    ``l < r`` (the ids live in different tables)."""
    d = int(max_distance)
    if d < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    ls = bind_one(left, left_column)
    rs = bind_one(right, right_column if right_column is not None else left_column)

    def _recs(df, s):
        return df.select(
            F.col(id_col).alias("__id"),
            s.alias("__s"),
            F.length(s).alias("__len"),
            _padded_grams(s, q=q, pad_char=pad_char).alias("__grams"),
        ).where(F.col("__s").isNotNull())

    lrec, rrec = _recs(left, ls), _recs(right, rs)
    if d == 0:
        return (
            lrec.select(F.col("__id").alias("record_id_l"), "__s")
            .join(
                rrec.select(F.col("__id").alias("record_id_r"), "__s"), "__s"
            )
            .select("record_id_l", "record_id_r", F.lit(0).alias("distance"))
        )
    prefix_len = q * d + 1

    # shared global order: document frequency over BOTH sides' grams
    all_toks = lrec.select(F.explode("__grams").alias("gram")).unionByName(
        rrec.select(F.explode("__grams").alias("gram"))
    )
    freq = all_toks.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))

    def _prefix(recs):
        toks = recs.select("__id", "__len", F.explode("__grams").alias("gram"))
        ranked = (
            toks.join(freq, "gram")
            .groupBy("__id", "__len")
            .agg(
                F.array_sort(F.collect_list(F.struct("df", "gram"))).alias("gs")
            )
        )
        return ranked.select(
            "__id",
            "__len",
            F.explode(F.slice("gs", 1, prefix_len)).alias("g"),
        ).select("__id", "__len", F.col("g.gram").alias("gram"))

    lp = _prefix(lrec.where(F.size("__grams") >= prefix_len)).alias("l")
    rp = _prefix(rrec.where(F.size("__grams") >= prefix_len)).alias("r")
    cand_long = (
        lp.join(
            rp,
            on=[
                F.col("l.gram") == F.col("r.gram"),
                F.abs(F.col("l.__len") - F.col("r.__len")) <= F.lit(d),
            ],
        )
        .select(
            F.col("l.__id").alias("record_id_l"),
            F.col("r.__id").alias("record_id_r"),
        )
        .distinct()
    )

    # low-gram-diversity fallback, run from EACH side against the other
    # (length-bucket probe, no partner length cap — see module docstring)
    def _short_cands(short_side, other_side, short_is_left: bool):
        shorts = short_side.where(F.size("__grams") < prefix_len).select(
            "__id", "__len"
        )
        partners = other_side.select(
            F.col("__id").alias("__pid"), F.col("__len").alias("__plen")
        )
        probe = shorts.select(
            "__id",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__len") - d, F.lit(0)),
                    F.col("__len") + d,
                )
            ).alias("__plen"),
        )
        joined = probe.join(partners, "__plen")
        if short_is_left:
            return joined.select(
                F.col("__id").alias("record_id_l"),
                F.col("__pid").alias("record_id_r"),
            )
        return joined.select(
            F.col("__pid").alias("record_id_l"),
            F.col("__id").alias("record_id_r"),
        )

    cands = (
        cand_long.unionByName(_short_cands(lrec, rrec, True))
        .unionByName(_short_cands(rrec, lrec, False))
        .dropDuplicates(["record_id_l", "record_id_r"])
    )

    lnarrow = lrec.select(F.col("__id").alias("__lvid"), F.col("__s").alias("__sl"))
    rnarrow = rrec.select(F.col("__id").alias("__rvid"), F.col("__s").alias("__sr"))
    if should_broadcast(lnarrow, max_bytes=broadcast_records_max_bytes):
        lnarrow = F.broadcast(lnarrow)
    if should_broadcast(rnarrow, max_bytes=broadcast_records_max_bytes):
        rnarrow = F.broadcast(rnarrow)
    return (
        cands.join(lnarrow, cands["record_id_l"] == lnarrow["__lvid"])
        .join(rnarrow, F.col("record_id_r") == rnarrow["__rvid"])
        .select(
            "record_id_l",
            "record_id_r",
            F.levenshtein(F.col("__sl"), F.col("__sr")).alias("distance"),
        )
        .where(F.col("distance") <= d)
    )
