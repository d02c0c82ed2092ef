"""Set-similarity join via prefix filtering (PPJoin-family), and sparse
TF-IDF cosine pair scoring.

These are the non-LSH half of scalable candidate generation for record
linkage: instead of hashing token sets into bands (``linker/lsh.py``),
prefix filtering exploits a GLOBAL rarity order over tokens — two sets
with Jaccard >= t must share a token inside each set's "prefix" of its
(|s| - ceil(t*|s|) + 1) globally-rarest tokens.  Joining on prefix
tokens only is exact (no false negatives) and, because prefixes hold the
*rarest* tokens, the equi-join buckets are small by construction: the
anti-skew property falls out of the algorithm rather than needing salts.

References: Chaudhuri, Ganti, Kaushik "A Primitive Operator for
Similarity Joins" (ICDE'06); Xiao et al. "Efficient Similarity Joins for
Near Duplicate Detection" (WWW'08).  The reference engine reaches the
same pairs through LSH (mismo/linker/_lsh_linker.py) — prefix filtering
is the deterministic, recall-1.0 alternative this repo adds for the
100 TB curation path.

Spark plan shape (all codegen, no UDFs):
  1. explode distinct tokens            → shuffle on token (partial agg)
  2. document-frequency groupBy         → (token, df), small-ish
  3. join df back + per-record sort     → shuffle on record_id
  4. explode PREFIX tokens + self-join  → shuffle on token, buckets
     bounded because prefixes hold rare tokens; length filter prunes
     candidates before the verify
  5. verify exact Jaccard on the narrow (id, tokens) table — broadcast
     when it fits, shuffle-join otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one, should_broadcast
from mismo_spark.sets.compare import jaccard_distinct


def _ranked_token_arrays(
    df: DataFrame, terms_column, *, id_col: str
) -> DataFrame:
    """(id, toks: array<struct<df,tok>> sorted by global rarity, n).

    The global token order is (document-frequency ASC, token ASC) — a
    total order, realized per record by sorting (df, tok) structs so no
    global rank/zipWithIndex pass is needed.  ``n`` is the DISTINCT
    token count used by the length filter.
    """
    terms = bind_one(df, terms_column)
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(terms)).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(freq, "tok")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("toks"))
        .withColumn("n", F.size("toks"))
    )


def prefix_filter_pairs(
    df: DataFrame,
    terms_column,
    *,
    threshold: float,
    id_col: str = "record_id",
    broadcast_records_max_bytes: int = 512 << 20,
) -> DataFrame:
    """All dedupe pairs with token-set Jaccard >= ``threshold``, exactly
    (recall 1.0 — prefix filtering admits no false negatives), without
    ever forming the all-pairs product.

    → (record_id_l, record_id_r, jaccard), record_id_l < record_id_r.

    Candidate generation joins only on each record's prefix of its
    globally-rarest (|s| - ceil(t*|s|) + 1) distinct tokens, with the
    length filter min(n_l,n_r) >= t * max(n_l,n_r) applied inside the
    join condition; the exact Jaccard verify then runs once per distinct
    surviving pair against the narrow (id, distinct-tokens) table
    (broadcast when under the byte gate).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    arr = _ranked_token_arrays(df, terms_column, id_col=id_col)
    # probing-prefix length: n - ceil(t*n) + 1
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")).cast("int") + 1)
    pref = arr.select(
        F.col(id_col).alias("__id"),
        F.col("n"),
        F.explode(F.slice("toks", F.lit(1), plen)).alias("s"),
    ).select("__id", "n", F.col("s.tok").alias("tok"))
    # materialize once: the self-join below references pref on BOTH
    # sides, and Spark does not reuse the aliased subtree — without
    # this the full tokenize → global-df rank → prefix pipeline (two
    # shuffles) executes twice
    pref = pref.localCheckpoint(eager=True)

    l, r = pref.alias("l"), pref.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.tok") == F.col("r.tok"),
                F.col("l.__id") < F.col("r.__id"),
                F.least(F.col("l.n"), F.col("r.n")).cast("double")
                >= F.lit(t) * F.greatest(F.col("l.n"), F.col("r.n")),
            ],
        )
        .select(
            F.col("l.__id").alias("record_id_l"),
            F.col("r.__id").alias("record_id_r"),
        )
        .distinct()
    )

    terms = bind_one(df, terms_column)
    narrow = df.select(
        F.col(id_col).alias("__vid"), F.array_distinct(terms).alias("__toks")
    )
    if should_broadcast(narrow, max_bytes=broadcast_records_max_bytes):
        narrow = F.broadcast(narrow)
    verified = (
        cand.join(narrow, cand["record_id_l"] == narrow["__vid"])
        .select("record_id_l", "record_id_r", F.col("__toks").alias("__tl"))
        .join(narrow, F.col("record_id_r") == narrow["__vid"])
        .select(
            "record_id_l",
            "record_id_r",
            jaccard_distinct(F.col("__tl"), F.col("__toks")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= t)
    )
    return verified


def tfidf_cosine_pairs(
    df: DataFrame,
    terms_column,
    *,
    min_cosine: float,
    id_col: str = "record_id",
    df_cap: int | None = None,
) -> DataFrame:
    """Dedupe pairs scored by TF-IDF-weighted cosine, computed as a
    SPARSE dot product: one self equi-join on token, partial-aggregated
    sum of per-token weight products — never a dense vector per pair.

    → (record_id_l, record_id_r, cosine), record_id_l < record_id_r,
    cosine >= min_cosine (6-dp rounded for cross-engine determinism).

    tf = in-document count, idf = ln(N / df) (mismo/sets/_tfidf.py:76-117
    semantics), per-document L2-normalized so the join's grouped sum IS
    the cosine.  ``df_cap`` drops tokens appearing in more than that
    many documents before weighting — the skew guard for 100 TB corpora
    (stopword-like tokens both blow up the token join and carry ~zero
    idf weight; capping changes scores only through those near-zero
    terms and is the standard curation-pipeline tradeoff).
    """
    terms = bind_one(df, terms_column)
    n_docs = df.count()
    tf = (
        df.select(F.col(id_col).alias("__id"), F.explode(terms).alias("tok"))
        .groupBy("__id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if df_cap is not None:
        docfreq = docfreq.where(F.col("df") <= int(df_cap))
    w = tf.join(docfreq, "tok").select(
        "__id",
        "tok",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("w"),
    )
    norm = w.groupBy("__id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    wn = w.join(norm, "__id").select(
        "__id",
        "tok",
        F.when(F.col("nrm") > 0, F.col("w") / F.col("nrm"))
        .otherwise(F.lit(0.0))
        .alias("wn"),
    )
    # materialize once: the cosine self-join references wn on BOTH
    # sides, and the tokenize → tf/idf → norm pipeline (three shuffles)
    # would otherwise execute twice
    wn = wn.localCheckpoint(eager=True)
    l, r = wn.alias("l"), wn.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.tok") == F.col("r.tok"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .groupBy(
            F.col("l.__id").alias("record_id_l"),
            F.col("r.__id").alias("record_id_r"),
        )
        .agg(F.round(F.sum(F.col("l.wn") * F.col("r.wn")), 6).alias("cosine"))
        .where(F.col("cosine") >= float(min_cosine))
    )
    return pairs
