"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dedupe: minhash near-dup candidate pairs over
the documents table → connected components → cluster assignments.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2, each with a DuckDB-equivalent ANSI SQL oracle
(column names aliased identically on both sides; floats rounded to 6 dp
on both sides).  Ops whose results depend on engine-specific hashing
(minhash-LSH keys, simhash) are included without an oracle → the driver
records the weaker rows-only check; their semantics are pytest-verified
instead (tests/test_lsh.py, tests/test_dedupe_extras.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"

_EN = ["the", "and", "of", "to", "in", "is", "that", "for", "with"]
_ES = ["el", "la", "de", "que", "los", "las", "una", "por", "como"]
_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"]
_FR = ["le", "la", "les", "des", "est", "une", "dans", "pour", "que"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "record_id", F.col("doc_id")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _micro(col, name: str):
    """Quantize a double to integer micro-units (half-up) for the
    driver's raw value-hash compare.  ``F.round(x, 6)`` is NOT safe for
    that hash: Spark rounds the decimal string (Java BigDecimal
    HALF_UP) while DuckDB rounds the binary double, and the two can
    disagree exactly at a 6-dp boundary (the round-3 ``pr_curve`` red
    row).  ``floor(x*1e6 + 0.5)`` is a single IEEE-identical expression
    on both engines — divergence now needs the *unquantized* inputs to
    straddle a floor boundary (~1e-10 per value) instead of any
    decimal-halfway case.  NaN/±inf are mapped to sentinels so DuckDB's
    BIGINT cast cannot error where Spark's saturates."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(None).cast("long"))
        .when(F.isnan(c), F.lit(-1000000001))
        .when(c >= F.lit(1e12), F.lit(1000000002))
        .when(c <= F.lit(-1e12), F.lit(-1000000002))
        .otherwise(F.floor(c * F.lit(1000000.0) + F.lit(0.5)))
        .cast("long")
        .alias(name)
    )


def _micro_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`_micro` (same CASE arms, same
    floor/cast sequence — see the Spark docstring for why)."""
    return (
        f"CASE WHEN ({expr}) IS NULL THEN NULL "
        f"WHEN isnan({expr}) THEN -1000000001 "
        f"WHEN ({expr}) >= 1e12 THEN 1000000002 "
        f"WHEN ({expr}) <= -1e12 THEN -1000000002 "
        f"ELSE CAST(floor(({expr}) * 1000000 + 0.5) AS BIGINT) END"
    )


def _micro_wrap(df: DataFrame, keep: list[str], micro: list[str]) -> DataFrame:
    """Project ``keep`` unchanged and each ``micro`` double column as
    ``<name>_micro`` via :func:`_micro`."""
    return df.select(*keep, *[_micro(c, f"{c}_micro") for c in micro])


def _micro_wrap_sql(sql: str, keep: list[str], micro: list[str]) -> str:
    """Oracle-side mirror of :func:`_micro_wrap`: wrap the original
    oracle in a subselect that micro-quantizes the named columns.
    Identifiers are double-quoted so names like ``min``/``max`` stay
    column references."""
    cols = ", ".join(
        [f'"{c}"' for c in keep]
        + [f'{_micro_sql(chr(34) + c + chr(34))} AS {c}_micro' for c in micro]
    )
    return f"SELECT {cols} FROM ({sql})"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup clustering of the documents table at sf0.001."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.dedupe import minhash_near_duplicates

    docs = _docs(spark, SF001)
    pairs = minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3
    )
    comps = connected_components(
        pairs.select("record_id_l", "record_id_r"),
        docs.select("record_id"),
        algorithm="star",
    )
    return comps


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyLinker.key_counts (mismo/linker/_key_linker.py:408-415)."""
    from mismo_spark.linker.key import KeyLinker

    return KeyLinker(["lang", "source"]).key_counts(_docs(spark, sf_dir))


def q_pair_counts_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyLinker.pair_counts, dedupe n(n−1)/2 (mismo/linker/_key_linker.py:418-445)."""
    from mismo_spark.linker.key import KeyLinker

    return KeyLinker(["lang", "source"]).pair_counts(
        _docs(spark, sf_dir), task="dedupe"
    )


def q_key_linker_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join blocking with dedupe guard."""
    from mismo_spark.linker.key import KeyLinker

    return KeyLinker(["lang", "source"], task="dedupe")(_docs(spark, sf_dir)).links


def q_key_linker_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key blocking ("explicit skew splitting"): keys whose
    pair count exceeds the per-task budget are triangle-tiled across
    tasks.  The oracle is the PLAIN equi-join — hash parity proves the
    salted physical plan is row-identical to the logical join."""
    from mismo_spark.linker.key import KeyLinker

    return KeyLinker(["lang"], task="dedupe", skew_split=2000)(
        _docs(spark, sf_dir)
    ).links


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortedNeighborhoodLinker (Hernández–Stolfo): window-3 pairs in
    (source, doc_id) sort order, built on the distributed
    range-partition + offset global rank (no single-task window)."""
    from mismo_spark.linker.sorted_neighborhood import SortedNeighborhoodLinker

    return SortedNeighborhoodLinker("source", window=3, task="dedupe")(
        _docs(spark, sf_dir)
    ).links


def q_or_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OrLinker: union of two rules with provenance (mismo/linker/_or_linker.py:20-77)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.or_ import OrLinker

    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    linker = OrLinker(
        {
            "langsrc": KeyLinker(["lang", "source"], task="dedupe"),
            "lenb": KeyLinker(["lang", "len_bucket"], task="dedupe"),
        }
    )
    # serialize the provenance array: the driver's canonicalizer can't
    # sort list-valued cells (both sides crashed identically in r01)
    return linker(docs, docs).links.withColumn(
        "blocking_rules", F.array_join("blocking_rules", ",")
    )


def q_with_n_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinkedTable.with_n_links incl. zero (mismo/types/_linked_table.py:192-245)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linked_table import with_n_links

    docs = _docs(spark, sf_dir)
    links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    return with_n_links(docs.select("record_id"), links, side="l")


def q_link_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """link_counts histogram (mismo/types/_linked_table.py:247-303)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linked_table import link_counts

    docs = _docs(spark, sf_dir)
    links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    return link_counts(docs.select("record_id"), links, side="l")


def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph degree (mismo/cluster/_metrics.py:28-69)."""
    from mismo_spark.cluster.metrics import degree
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir)
    links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    return degree(links)


def q_with_linked_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """with_linked_values: collected neighbour arrays + max aggregate
    (mismo/types/_linked_table.py:53-190)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linked_table import with_linked_values

    docs = _docs(spark, sf_dir)
    links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    out = with_linked_values(
        docs.select("record_id"),
        docs.select("record_id", "n_chars"),
        links,
        side="l",
        neighbour_max_chars=lambda j: F.max("n_chars"),
        neighbour_ids=lambda j: F.sort_array(F.collect_list("record_id_r")),
    )
    # serialize the id array (numeric-sorted, then stringified) — the
    # driver's canonicalizer can't hash list-valued cells
    return out.withColumn(
        "neighbour_ids",
        F.array_join(
            F.transform("neighbour_ids", lambda x: x.cast("string")), ","
        ),
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC over clique edges from one blocking key — oracle = min id per
    key group (cliques ⇒ window-min); full CC semantics are
    pytest-verified on arbitrary graphs (tests/test_cc.py)."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir)
    links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    return connected_components(
        links, docs.select("record_id"), algorithm="star"
    )


def q_fs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EnumComparer labels + Fellegi-Sunter odds with fixed weights
    (mismo/compare/_enum_comparer.py:44-78, mismo/fs/_weights.py:269-331)."""
    from mismo_spark.compare.enum import EnumComparer, compare
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    comparers = _len_comparers()
    weights = _fs_weights_len()
    scored = weights.score_compared(compare(pairs, comparers))
    return scored.select(
        "record_id_l",
        "record_id_r",
        F.col("len_cmp").cast("long").alias("len_cmp"),
        F.round("odds", 6).alias("odds"),
        F.round("match_probability", 6).alias("match_probability"),
    )


def q_fs_score_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter with Splink-style term-frequency adjustment: the
    exact n_chars level's odds become m/f_v (value-specific Bayes
    factor) via one record-level frequency join — no pair shuffle."""
    from mismo_spark.compare.enum import EnumComparer, compare
    from mismo_spark.fs.tf_adjust import score_compared_tf
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.tf import add_frequencies
    from mismo_spark.types.linkage import Linkage

    docs = add_frequencies(_docs(spark, sf_dir), "n_chars")
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    comparers = _len_comparers()
    weights = _fs_weights_len()
    freq = F.greatest(
        F.col("n_chars_frequency_l"), F.col("n_chars_frequency_r")
    )
    scored = score_compared_tf(
        weights, compare(pairs, comparers), {"len_cmp": freq}
    )
    return scored.select(
        "record_id_l",
        "record_id_r",
        F.col("len_cmp").cast("long").alias("len_cmp"),
        F.round("odds", 6).alias("odds"),
        F.round("match_probability", 6).alias("match_probability"),
    )


def q_score_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair evidence breakdown (splink waterfall data): one row per
    (pair, dimension) with fired level, odds, log2 Bayes factor, plus a
    'total' row — a pure unpivot of score_compared's columns."""
    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.weights import score_waterfall
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    weights = _fs_weights_len()
    scored = weights.score_compared(compare(pairs, _len_comparers()))
    out = score_waterfall(scored, weights)
    return out.select(
        "record_id_l",
        "record_id_r",
        "dimension",
        "level",
        F.round("odds", 6).alias("odds"),
        F.round("log2_bf", 6).alias("log2_bf"),
    )


def q_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uncertainty-band labeling sample over FS-scored
    pairs: equi-width probability bands, md5-ranked top-n per band —
    the same corpus + seed always yields the same labeling queue."""
    from mismo_spark.fs.labeling import sample_pairs_for_labeling

    from mismo_spark.compare.enum import EnumComparer, compare
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    comparers = _len_comparers()
    weights = _fs_weights_len()
    scored = weights.score_compared(compare(pairs, comparers))
    out = sample_pairs_for_labeling(
        scored, n_per_band=10, n_bands=5, seed=42
    )
    return out.select(
        "record_id_l",
        "record_id_r",
        F.col("band").cast("long").alias("band"),
        F.col("rank").cast("long").alias("rank"),
        F.round("match_probability", 6).alias("match_probability"),
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.textqa import token_count

    return _docs(spark, sf_dir).select(
        "record_id", token_count(F.col("text")).alias("n_tokens")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.textqa import lang_id

    return (
        _docs(spark, sf_dir)
        .select(lang_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.textqa import quality_score

    return _docs(spark, sf_dir).select(
        "record_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.textqa import fingerprint_hex

    return _docs(spark, sf_dir).select(
        "record_id", fingerprint_hex(F.col("text")).alias("fp")
    )


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over events.props (documents have no exact
    dups at any sf)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.select(F.md5(F.col("props")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") >= 2)
    )


def q_tfidf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term_idf over whitespace tokens (mismo/sets/_tfidf.py:76-117)."""
    from mismo_spark.sets.tfidf import term_idf
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).withColumn(
        "tokens", tokenize(F.lower(F.col("text")))
    )
    return term_idf(docs, "tokens").select("term", F.round("idf", 6).alias("idf"))


def q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.sets.tfidf import rare_terms
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).withColumn(
        "tokens", tokenize(F.lower(F.col("text")))
    )
    return rare_terms(docs, "tokens", max_records_n=2)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard over blocked pairs (mismo/sets/_compare.py:6-23)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.sets.compare import jaccard
    from mismo_spark.text.features import tokenize
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "source",
        F.array_distinct(tokenize(F.lower(F.col("text")))).alias("tokens"),
    )
    lk = KeyLinker(["source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        F.round(jaccard(F.col("tokens_l"), F.col("tokens_r")), 6).alias("jaccard_sim"),
    ).filter(F.col("jaccard_sim") >= 0.05)


def q_levenshtein_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein_ratio on text prefixes over blocked pairs
    (mismo/text/_similarity.py:50-109)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.similarity import levenshtein_ratio
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id", "lang", "source", F.substring("text", 1, 40).alias("prefix")
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        F.round(
            levenshtein_ratio(F.col("prefix_l"), F.col("prefix_r")), 6
        ).alias("lev_ratio"),
    )


def q_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler pandas UDF vs DuckDB's builtin
    (mismo/text/_similarity.py:147-181)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.similarity import jaro_winkler_similarity
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id", "lang", "source", F.substring("text", 1, 30).alias("prefix")
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        F.round(
            jaro_winkler_similarity(F.col("prefix_l"), F.col("prefix_r")), 6
        ).alias("jw"),
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over embeddings (similarity search)."""
    from mismo_spark.ann import cosine_topk

    emb = _emb(spark, sf_dir)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.select(
        "query_id", "neighbour_id", F.round("cosine", 6).alias("cosine")
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mismo_spark.vector import norm

    return _emb(spark, sf_dir).select(
        "vec_id",
        F.round(norm(F.col("embedding").cast("array<double>")), 6).alias("l2_norm"),
    )


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding centroids + member cosine-to-centroid
    (ascending = review order) over a deterministic vec_id%40
    clustering — the content-side false-merge detector."""
    from mismo_spark.cluster.centroid import embedding_outliers

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    assignments = emb.select(
        F.col("vec_id").alias("record_id"),
        (F.col("vec_id") % 40).alias("component"),
    )
    out = embedding_outliers(assignments, emb, id_col="vec_id")
    return out.select(
        "record_id",
        "component",
        F.round("cosine_to_centroid", 6).alias("cosine_to_centroid"),
    )


def q_minhash_lsh_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH blocking, md5 hash family: the full pipeline
    (shingle → minhash signature → band bucket join → exact-Jaccard
    recheck) is deterministic, engine-independent column algebra, so the
    DuckDB oracle replays ALL of it, not just the post-filter.  The
    xxhash64 production family has the identical plan (only the hash
    expr differs) and its acceptance curve is verified in
    tests/test_lsh.py."""
    from mismo_spark.dedupe import minhash_near_duplicates

    docs = _docs(spark, sf_dir)
    out = minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.2,
        hasher="md5",
    )
    return out.select(
        "record_id_l",
        "record_id_r",
        F.round("jaccard_sim", 6).alias("jaccard_sim"),
    )


def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash near-dup with verify='estimate' (md5 family): Jaccard
    from the 16-component sketch agreement instead of a shingle-array
    rejoin — the O(n_hashes)-per-pair screen for 10^12 docs."""
    from mismo_spark.dedupe import minhash_near_duplicates

    docs = _docs(spark, sf_dir)
    out = minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.2,
        hasher="md5", verify="estimate",
    )
    return out.select(
        "record_id_l",
        "record_id_r",
        F.round("jaccard_est", 6).alias("jaccard_est"),
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup, md5_32 hash family (oracle replays the whole
    explode → per-bit majority → block-permutation join → hamming filter
    in SQL).  Valid params: max_hamming=3 ≤ n_blocks−1=3, the pigeonhole
    completeness bound (the r01 params max_hamming=20 silently voided
    it; the library now raises on such calls)."""
    from mismo_spark.dedupe import simhash_near_duplicates

    return simhash_near_duplicates(
        _docs(spark, sf_dir),
        max_hamming=3,
        n_blocks=4,
        n_bits=32,
        hasher="md5_32",
    )


def q_clean_phone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_phone_number (mismo/lib/phone/_core.py:31-82) on TPC-H
    customer phones."""
    from mismo_spark.lib.phone import clean_phone_number

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    raw = F.concat(
        F.when(k % 3 == 0, F.lit("1-")).otherwise(F.lit("")),
        F.lit("("),
        (k % 700 + 300).cast("string"),
        F.lit(") "),
        ((k * 7) % 800 + 200).cast("string"),
        F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    return cust.select(
        "c_custkey", clean_phone_number(raw).alias("phone")
    )


def _synth_url(k) -> F.Column:
    """Deterministic messy URL per customer key — case noise, default
    and non-default ports, tracking params, unsorted query, fragments.
    The oracle rebuilds the identical string in SQL."""
    return F.concat(
        F.when(k % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://")),
        F.when(k % 5 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("shop"),
        (k % 7).cast("string"),
        F.lit(".Example"),
        (k % 3).cast("string"),
        F.lit(".COM"),
        F.when((k % 4 == 0) & (k % 2 == 0), F.lit(":443"))
        .when(k % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/p/"),
        (k % 97).cast("string"),
        F.lit("?utm_source=x&b="),
        (k % 13).cast("string"),
        F.lit("&a="),
        (k % 11).cast("string"),
        F.when(k % 6 == 0, F.lit("&ref=feed")).otherwise(F.lit("")),
        F.when(k % 8 == 0, F.lit("#s")).otherwise(F.lit("")),
    )


def q_clean_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lib/url.clean_url + registrable_domain (web-native
    canonicalization; no mismo counterpart) on synthesized messy URLs."""
    from mismo_spark.lib.url import clean_url, registrable_domain

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    raw = _synth_url(F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        clean_url(raw).alias("url_clean"),
        registrable_domain(raw).alias("domain"),
    )


def q_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lib/url.surt — the Common Crawl / CDX sort key
    (com,example)/path?query): reversed comma-joined host, dropped
    scheme/www/default ports, sorted tracking-stripped query.  Same
    synthesized messy URLs as clean_url."""
    from mismo_spark.lib.url import surt

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    raw = _synth_url(F.col("c_custkey"))
    return cust.select("c_custkey", surt(raw).alias("surt"))


_SURT_ORACLE_PARSE = r"""
    WITH raw AS (
      SELECT c_custkey,
        (CASE WHEN c_custkey % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END)
        || (CASE WHEN c_custkey % 5 = 0 THEN 'WWW.' ELSE '' END)
        || 'shop' || (c_custkey % 7)::VARCHAR
        || '.Example' || (c_custkey % 3)::VARCHAR || '.COM'
        || (CASE WHEN c_custkey % 4 = 0 AND c_custkey % 2 = 0 THEN ':443'
                 WHEN c_custkey % 4 = 1 THEN ':8080' ELSE '' END)
        || '/p/' || (c_custkey % 97)::VARCHAR
        || '?utm_source=x&b=' || (c_custkey % 13)::VARCHAR
        || '&a=' || (c_custkey % 11)::VARCHAR
        || (CASE WHEN c_custkey % 6 = 0 THEN '&ref=feed' ELSE '' END)
        || (CASE WHEN c_custkey % 8 = 0 THEN '#s' ELSE '' END) AS url
      FROM customer
    ),
    p AS (
      SELECT c_custkey,
        lower(coalesce(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1), '')) AS scheme,
        coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$', 1), '') AS rest
      FROM raw
    ),
    q AS (
      SELECT c_custkey, scheme,
        lower(coalesce(regexp_extract(rest, '^([^/?#]*)', 1), '')) AS hostport,
        coalesce(regexp_extract(rest, '^[^/?#]*([^?#]*)', 1), '') AS path0,
        coalesce(regexp_extract(rest, '\?([^#]*)', 1), '') AS query0
      FROM p
    ),
    r AS (
      SELECT c_custkey, scheme,
        regexp_replace(coalesce(regexp_extract(hostport, '^([^:]*)', 1), ''),
                       '^www\.', '') AS host,
        nullif(coalesce(regexp_extract(hostport, ':(\d+)$', 1), ''), '') AS port,
        CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        coalesce(array_to_string(
          list_sort(list_filter(string_split(query0, '&'),
            x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
          '&'), '') AS canq
      FROM r0
    )
"""


_SURT_ORACLE_SQL = _SURT_ORACLE_PARSE.replace("FROM r0", "FROM q") + """
    SELECT c_custkey,
      array_to_string(list_reverse(string_split(host, '.')), ',')
      || (CASE WHEN port IS NULL
                OR (scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443')
          THEN '' ELSE ':' || port END)
      || ')' || path
      || (CASE WHEN canq = '' THEN '' ELSE '?' || canq END) AS surt
    FROM r
"""


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist screen (lib/url.blocklist_filter): drop URLs
    whose host equals or sits under a blocked domain — suffix-explode
    + broadcast hash probe, never a per-row regex scan.  Blocklist =
    {example0.com, shop3.example1.com} over the synthesized messy
    URLs."""
    from mismo_spark.lib.url import blocklist_filter

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    docs = cust.select("c_custkey", _synth_url(F.col("c_custkey")).alias("url"))
    blocked = spark.createDataFrame(
        [("example0.com",), ("shop3.example1.com",)], "domain string"
    )
    return blocklist_filter(docs, blocked).select("c_custkey")


_BLOCKLIST_ORACLE_SQL = r"""
    WITH raw AS (
      SELECT c_custkey,
        (CASE WHEN c_custkey % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END)
        || (CASE WHEN c_custkey % 5 = 0 THEN 'WWW.' ELSE '' END)
        || 'shop' || (c_custkey % 7)::VARCHAR
        || '.Example' || (c_custkey % 3)::VARCHAR || '.COM'
        || (CASE WHEN c_custkey % 4 = 0 AND c_custkey % 2 = 0 THEN ':443'
                 WHEN c_custkey % 4 = 1 THEN ':8080' ELSE '' END)
        || '/p/' || (c_custkey % 97)::VARCHAR
        || '?utm_source=x&b=' || (c_custkey % 13)::VARCHAR
        || '&a=' || (c_custkey % 11)::VARCHAR
        || (CASE WHEN c_custkey % 6 = 0 THEN '&ref=feed' ELSE '' END)
        || (CASE WHEN c_custkey % 8 = 0 THEN '#s' ELSE '' END) AS url
      FROM raw0
    ),
    h AS (
      SELECT c_custkey,
        regexp_extract(
          lower(regexp_extract(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$', 1),
            '^([^/?#]*)', 1)),
          '^([^:]*)', 1) AS host
      FROM raw
    )
    SELECT c_custkey FROM h
    WHERE NOT (
      host = 'example0.com' OR host LIKE '%.example0.com'
      OR host = 'shop3.example1.com' OR host LIKE '%.shop3.example1.com'
    )
""".replace("FROM raw0", "FROM customer")


def q_url_match_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lib/url.match_level: EXACT / SAME_PATH / SAME_DOMAIN / ELSE over
    synthesized URL pairs covering all four levels."""
    from mismo_spark.lib.url import match_level

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    sub = (k % 5).cast("string")
    page = (k % 17).cast("string")
    qv = (k % 7).cast("string")
    u1 = F.concat(
        F.lit("https://a.example"), sub, F.lit(".com/p/"), page,
        F.lit("?q="), qv, F.lit("&utm_x=1"),
    )
    u2 = (
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("HTTPS://A.example"), sub, F.lit(".COM/p/"), page,
                F.lit("?q="), qv,
            ),
        )
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("https://a.example"), sub, F.lit(".com/p/"), page,
                F.lit("?q="), ((k % 7) + 1).cast("string"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(F.lit("https://b.example"), sub, F.lit(".com/z/"), page),
        )
        .otherwise(
            F.concat(F.lit("https://a.example"), sub, F.lit(".net/p/"), page)
        )
    )
    return cust.select("c_custkey", match_level(u1, u2).alias("lvl"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (sessions.sessionize): per-user session
    ordinal via lag + cumulative-sum windows, 2h gap."""
    from mismo_spark.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(
        ev, gap_seconds=7200, tiebreak_col="event_id"
    ).select("event_id", "user_id", "session_id")


_LEARN_RULES = {
    "fp20": lambda df: F.substring(df["text"], 1, 20),
    "langsrc": ["lang", "source"],
    "lenbin": lambda df: F.floor(df["n_chars"] / 100),
    "nchars": "n_chars",
}


def _learn_inputs(spark: SparkSession, sf_dir: str):
    """Records + labeled matches for blocking-rule learning: truth is
    the shared 50-char text fingerprint (same ground truth as
    pr_curve)."""
    docs = _docs(spark, sf_dir).drop("doc_id")  # _docs already adds record_id
    fp = docs.select(
        "record_id", F.substring("text", 1, 50).alias("__fp")
    )
    labels = (
        fp.alias("a")
        .join(fp.alias("b"), F.col("a.__fp") == F.col("b.__fp"))
        .filter(F.col("a.record_id") < F.col("b.record_id"))
        .select(
            F.col("a.record_id").alias("record_id_l"),
            F.col("b.record_id").alias("record_id_r"),
        )
    )
    return docs, labels


def q_blocking_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """blocking_rule_stats (mismo_spark/linker/learn.py): labeled-match
    coverage vs corpus-wide candidate volume for 4 candidate rules —
    the evidence table behind blocking-scheme design."""
    from mismo_spark.linker.learn import blocking_rule_stats

    docs, labels = _learn_inputs(spark, sf_dir)
    out = blocking_rule_stats(docs, labels, _LEARN_RULES)
    return out.select(
        "rule",
        F.col("covered").cast("long").alias("covered"),
        F.col("n_labels").cast("long").alias("n_labels"),
        _micro("recall", "recall_micro"),
        F.col("est_pairs").cast("long").alias("est_pairs"),
    )


def q_blocking_rule_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greedy_blocking_rules (mismo_spark/linker/learn.py): greedy
    weighted set cover over the labeled matches, k=3, candidates
    {lenbin, langsrc, nchars} (fp20 excluded — it IS the truth key and
    would cover in one step).  The oracle unrolls the greedy choice as
    CASE levels keyed on each step's argmin pick."""
    from mismo_spark.linker.learn import greedy_blocking_rules

    docs, labels = _learn_inputs(spark, sf_dir)
    rules = {k: _LEARN_RULES[k] for k in ("langsrc", "lenbin", "nchars")}
    out = greedy_blocking_rules(docs, labels, rules, k=3)
    return out.select(
        F.col("step").cast("long").alias("step"),
        "rule",
        F.col("new_covered").cast("long").alias("new_covered"),
        F.col("cum_covered").cast("long").alias("cum_covered"),
        F.col("est_pairs").cast("long").alias("est_pairs"),
    )


def q_time_window_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeWindowLinker (mismo_spark/linker/time.py): same-user event
    pairs within 600 s, found via the bucket equi-join (exploded
    adjacent-bucket probe, exactly-once generation) — never an
    inequality join.  All arithmetic is integer microseconds
    (unix_micros / epoch_us), so the oracle replay is exact."""
    from mismo_spark.linker.time import TimeWindowLinker

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("event_id").alias("record_id"), "ts", "user_id"
        )
    )
    lk = TimeWindowLinker("ts", window=600.0, keys=["user_id"], task="dedupe")
    return lk(ev).links.select(
        F.col("record_id_l").cast("long").alias("record_id_l"),
        F.col("record_id_r").cast("long").alias("record_id_r"),
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates via F.session_window (batch mode; the
    same expression runs under Structured Streaming with a watermark).
    Oracle replays session_window's strict-overlap merge rule."""
    from mismo_spark.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(
        ev,
        gap="2 hours",
        agg_exprs=[F.round(F.sum("value"), 6).alias("sum_value")],
    )


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays.array_combinations / mean / median / sum
    (mismo/arrays/_array.py:14-34, _builtins.py:29-71) over synthesized
    per-row arrays; combinations serialized for the scalar comparator."""
    from mismo_spark.arrays import (
        array_combinations,
        array_mean,
        array_median,
        array_sum,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    a = F.array(k % 5, k % 7, k % 11)
    b = F.array(k % 2, k % 3)
    combos = array_combinations(a, b)
    combo_str = F.array_join(
        F.transform(
            combos,
            lambda s: F.concat(
                s["l"].cast("string"), F.lit(":"), s["r"].cast("string")
            ),
        ),
        ",",
    )
    return cust.select(
        "c_custkey",
        combo_str.alias("combos"),
        F.round(array_mean(a), 6).alias("mean_a"),
        array_median(a).alias("med_a"),
        F.round(array_sum(b), 6).alias("sum_b"),
    )


def q_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity self-join (PPJoin-family) over the
    WHOLE corpus — no blocking key.  Exact recall means the oracle can be
    brute-force all-pairs Jaccard >= t, which verifies the guarantee, not
    just the implementation."""
    from mismo_spark.sets.ssjoin import prefix_filter_pairs
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).select(
        "record_id", tokenize(F.lower(F.col("text"))).alias("tokens")
    )
    pairs = prefix_filter_pairs(docs, "tokens", threshold=0.5)
    return pairs.select(
        "record_id_l", "record_id_r", F.round("jaccard", 6).alias("jaccard")
    )


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine pair scoring: one token equi-join, grouped
    sum of weight products — never a dense vector per pair."""
    from mismo_spark.sets.ssjoin import tfidf_cosine_pairs
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).select(
        "record_id", tokenize(F.lower(F.col("text"))).alias("tokens")
    )
    return tfidf_cosine_pairs(docs, "tokens", min_cosine=0.2)


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass precision/recall sweep over FS-scored labeled pairs:
    groupBy(score) collapses the pair table to <= #agreement-patterns
    rows BEFORE the cumulative window, so no global single-partition
    pass over pairs.

    Round-4 hardening of round 3's one red row:

    * Label = shared 50-char text fingerprint, and the blocking is
      (lang, source) OR that fingerprint, so the positive path actually
      fires (the old exact-text label had tp=0/fn=0 at every shipped
      sf — zero exact dups land in a (lang, source) block).
    * All emitted metrics are integer micro-units computed with exact
      integer arithmetic (``div``), so no 6-dp double-rounding ULP
      (Spark BigDecimal HALF_UP vs DuckDB binary-double round) can
      leak into the driver's value hash."""
    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.curve import precision_recall_curve
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.or_ import OrLinker

    docs = _docs(spark, sf_dir).withColumn(
        "text_fp", F.substring("text", 1, 50)
    )
    lk = OrLinker(
        {
            "langsrc": KeyLinker(["lang", "source"], task="dedupe"),
            "textfp": KeyLinker(["text_fp"], task="dedupe"),
        },
        track_rules=False,
    )(docs, docs)
    pairs = lk.links_with_both()
    scored = _fs_weights_len().score_compared(
        compare(pairs, _len_comparers())
    ).withColumn("is_match", F.col("text_fp_l") == F.col("text_fp_r"))
    curve = precision_recall_curve(scored, score="odds", label="is_match")
    return curve.select(
        F.round(F.col("threshold") * 1e6).cast("long").alias("threshold_micro"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.expr("div(1000000 * tp, tp + fp)").cast("long").alias(
            "precision_micro"
        ),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN div(1000000 * tp, tp + fn)"
            " ELSE 0 END"
        ).cast("long").alias("recall_micro"),
    ).withColumn(
        "f1_micro",
        F.expr(
            "CASE WHEN precision_micro + recall_micro > 0"
            " THEN div(2 * precision_micro * recall_micro,"
            " precision_micro + recall_micro) ELSE 0 END"
        ).cast("long"),
    )


def _bm25_queries(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            ("q1", ["hash", "join"]),
            ("q2", ["vector", "scan", "batch"]),
            ("q3", ["customer", "order"]),
        ],
        "query_id string, terms array<string>",
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval: corpus stats from ONE explode, a
    broadcast join of the query terms, per-query WindowGroupLimit
    top-k.  Scores quantized to micro-units — each score is a sum of
    ≤3 terms of integer-derived IEEE arithmetic, identical on both
    engines."""
    from mismo_spark.sets.bm25 import bm25_topk
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).select(
        "doc_id", tokenize(F.lower(F.col("text"))).alias("toks")
    )
    top = bm25_topk(
        docs, "toks", _bm25_queries(spark), k=10, id_column="doc_id"
    )
    return top.select(
        "query_id",
        "doc_id",
        _micro(F.col("score"), "score_micro"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_meta_blocking_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-blocking candidate graph (Papadakis et al. 2014): one
    narrow (record, block) relation over three blocking schemes, blocks
    over the purge cap dropped, pair weights from one groupBy."""
    from mismo_spark.linker.meta import candidate_graph

    docs = _docs(spark, sf_dir).select(
        "record_id",
        F.substring("text", 1, 20).alias("fp20"),
        "lang",
        "source",
        (F.col("n_chars") - F.col("n_chars") % 50).alias("len_bin"),
    )
    g = candidate_graph(
        docs,
        ["fp20", ["lang", "source"], "len_bin"],
        max_block_size=60,
    )
    return g.select(
        "record_id_l",
        "record_id_r",
        F.col("cbs").cast("long").alias("cbs"),
        _micro(F.col("js"), "js_micro"),
    )


def q_meta_blocking_cnp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality Node Pruning over the same graph: per-node top-k by
    Jaccard weight (integer-derived IEEE doubles — identical ranking on
    both engines), edge kept if either endpoint retains it."""
    from mismo_spark.linker.meta import meta_block

    docs = _docs(spark, sf_dir).select(
        "record_id",
        F.substring("text", 1, 20).alias("fp20"),
        "lang",
        "source",
        (F.col("n_chars") - F.col("n_chars") % 50).alias("len_bin"),
    )
    pruned = meta_block(
        docs,
        ["fp20", ["lang", "source"], "len_bin"],
        scheme="cnp",
        k=3,
        max_block_size=60,
    )
    return pruned.select(
        "record_id_l",
        "record_id_r",
        F.col("cbs").cast("long").alias("cbs"),
        _micro(F.col("js"), "js_micro"),
    )


def q_unlinkables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlinkables analysis (splink-style): per-record best FS odds over
    the pr_curve blocking, collapsed to a score histogram before the
    one cumulative window; never-compared records ride in as the NULL
    bin.  The three distinct odds values are literal ratios — identical
    IEEE doubles on both engines, so grouping needs no rounding."""
    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.unlinkables import unlinkables
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.or_ import OrLinker

    docs = _docs(spark, sf_dir).withColumn(
        "text_fp", F.substring("text", 1, 50)
    )
    lk = OrLinker(
        {
            "langsrc": KeyLinker(["lang", "source"], task="dedupe"),
            "textfp": KeyLinker(["text_fp"], task="dedupe"),
        },
        track_rules=False,
    )(docs, docs)
    scored = _fs_weights_len().score_compared(
        compare(lk.links_with_both(), _len_comparers())
    )
    out = unlinkables(docs, scored, score="odds", round_digits=None)
    return out.select(
        _micro(F.col("best"), "best_micro"),
        F.col("n_records").cast("long").alias("n_records"),
        F.col("cum_records").cast("long").alias("cum_records"),
        _micro(F.col("cum_prop"), "cum_prop_micro"),
    )


def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data over FS-scored labeled pairs: one
    ≤n_bins-row aggregate, label = shared 50-char fingerprint (same
    ground truth as pr_curve).  Bin means micro-quantized; the binned
    probabilities are ratios of identical literal-derived doubles, so
    binning is engine-invariant."""
    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.calibration import calibration_curve
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.or_ import OrLinker

    docs = _docs(spark, sf_dir).withColumn(
        "text_fp", F.substring("text", 1, 50)
    )
    lk = OrLinker(
        {
            "langsrc": KeyLinker(["lang", "source"], task="dedupe"),
            "textfp": KeyLinker(["text_fp"], task="dedupe"),
        },
        track_rules=False,
    )(docs, docs)
    scored = _fs_weights_len().score_compared(
        compare(lk.links_with_both(), _len_comparers())
    ).withColumn("is_match", F.col("text_fp_l") == F.col("text_fp_r"))
    curve = calibration_curve(scored, n_bins=10)
    return curve.select(
        F.col("bin").cast("long").alias("bin"),
        _micro(F.col("p_lo"), "p_lo_micro"),
        _micro(F.col("p_hi"), "p_hi_micro"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        _micro(F.col("mean_predicted"), "mean_predicted_micro"),
        _micro(F.col("fraction_matched"), "fraction_matched_micro"),
    )


def q_dup_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022):
    positional n-gram hashes -> corpus counts -> per-doc
    gaps-and-islands interval merge."""
    from mismo_spark.textqa.spans import duplicated_token_spans

    spans = duplicated_token_spans(
        _docs(spark, sf_dir), n=5, min_count=2, id_col="record_id"
    )
    return spans.select(
        "record_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage of merged duplicated spans (zeros for
    clean documents)."""
    from mismo_spark.textqa.spans import duplicated_span_stats

    stats = duplicated_span_stats(
        _docs(spark, sf_dir), n=5, min_count=2, id_col="record_id"
    )
    return stats.select(
        "record_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        "dup_token_frac",
    )


def _metrics_micro(df: DataFrame, *head: str) -> DataFrame:
    """Recompute the three blocking ratios as integer micro-units from
    the exact count columns (div = integer division on both engines),
    so no 6-dp double-rounding ULP can leak into the driver's hash —
    same hardening as q_pr_curve."""
    return df.select(
        *head,
        "n_naive",
        "n_candidates",
        "n_true",
        "n_found",
        F.expr(
            "CASE WHEN n_naive > 0 THEN"
            " div(1000000 * (n_naive - n_candidates), n_naive)"
            " ELSE 0 END"
        ).cast("long").alias("reduction_micro"),
        F.expr(
            "CASE WHEN n_true > 0 THEN div(1000000 * n_found, n_true)"
            " ELSE 0 END"
        ).cast("long").alias("completeness_micro"),
        F.expr(
            "CASE WHEN n_candidates > 0 THEN"
            " div(1000000 * n_found, n_candidates) ELSE 0 END"
        ).cast("long").alias("quality_micro"),
    )


def q_blocking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduction ratio / pairs completeness / pairs quality of the
    (lang, source) blocker against shared-50-char-fingerprint ground
    truth (the corpus has ZERO exact text dups at sf<=0.01, so the old
    exact-text truth made completeness a vacuous 0 — the fingerprint
    truth has n_true=25 at the driver's sf0.01)."""
    from mismo_spark.linker.eval import blocking_metrics
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "text_fp", F.substring("text", 1, 50)
    )
    cand = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    true = KeyLinker(["text_fp"], task="dedupe")(docs).links
    return _metrics_micro(blocking_metrics(cand, true, n_left=docs.count()))


def q_blocking_schemes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheme-selection scorecard: three candidate blocking keys scored
    against shared-50-char-fingerprint ground truth in one DataFrame —
    the 'pick the cheapest key that keeps completeness' loop.  Every
    scheme finds >= 1 true pair at the shipped scales, so neither
    completeness nor quality is vacuous."""
    from mismo_spark.linker.eval import compare_blocking_schemes
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "text_fp", F.substring("text", 1, 50)
    )
    schemes = {
        "lang_source": KeyLinker(["lang", "source"], task="dedupe")(
            docs
        ).links,
        "source_len200": KeyLinker(
            ["source", F.floor(F.col("n_chars") / F.lit(200))], task="dedupe"
        )(docs).links,
        "lang_len100": KeyLinker(
            ["lang", F.floor(F.col("n_chars") / F.lit(100))], task="dedupe"
        )(docs).links,
    }
    true = KeyLinker(["text_fp"], task="dedupe")(docs).links
    return _metrics_micro(
        compare_blocking_schemes(schemes, true, n_left=docs.count()),
        "scheme",
    )


def q_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components: fold (source, n_chars bucket)
    links into an existing (lang, source) clustering.  The oracle runs
    CC from scratch over the UNION graph with a recursive-CTE closure —
    checking the incremental==full-recompute identity itself."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.incremental import incremental_components
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir)
    old = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    assignments = connected_components(old, docs.select("record_id"))
    new = KeyLinker(
        ["source", F.floor(F.col("n_chars") / F.lit(200))], task="dedupe"
    )(docs).links
    return incremental_components(assignments, new)


def q_cc_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decremental cluster maintenance: delete every edge with
    (id_l + id_r) % 3 == 0 from the union graph and re-cluster ONLY the
    touched components from their surviving edges (splits included).
    The oracle recomputes CC from scratch over the remaining edges —
    checking the maintain==full-recompute identity itself."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.decremental import decremental_components
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir)
    links = (
        KeyLinker(["lang", "source"], task="dedupe")(docs)
        .links.unionByName(
            KeyLinker(
                ["source", F.floor(F.col("n_chars") / F.lit(200))],
                task="dedupe",
            )(docs).links
        )
        .distinct()
    )
    assignments = connected_components(links, docs.select("record_id"))
    removed = links.where(
        (F.col("record_id_l") + F.col("record_id_r")) % 3 == 0
    )
    return decremental_components(assignments, links, removed)


def q_cluster_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster drift telemetry between two assignment snapshots:
    old = (lang, source) graph, new = union graph minus every edge with
    (id_l + id_r) % 3 == 0 — so the event matrix exercises merges
    (added bkt edges) AND splits (removed lang-source edges)."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.crosswalk import cluster_events
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir)
    old_links = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    union_links = old_links.unionByName(
        KeyLinker(
            ["source", F.floor(F.col("n_chars") / F.lit(200))], task="dedupe"
        )(docs).links
    ).distinct()
    new_links = union_links.where(
        (F.col("record_id_l") + F.col("record_id_r")) % 3 != 0
    )
    recs = docs.select("record_id")
    old = connected_components(old_links, recs)
    new = connected_components(new_links, recs)
    return cluster_events(old, new)


def _fs_weights_len():
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights

    return Weights(
        [
            ComparerWeights(
                "len_cmp",
                [
                    LevelWeights("exact", m=0.6, u=0.01),
                    LevelWeights("close", m=0.3, u=0.09),
                    LevelWeights("else", m=0.1, u=0.9),
                ],
            )
        ]
    )


def _len_comparers():
    from mismo_spark.compare.enum import EnumComparer

    return [
        EnumComparer(
            "len_cmp",
            [
                ("exact", lambda df: df["n_chars_l"] == df["n_chars_r"]),
                (
                    "close",
                    lambda df: F.abs(df["n_chars_l"] - df["n_chars_r"]) <= 20,
                ),
            ],
        ),
    ]


def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster QA: per-component intra-link odds distribution, weak-link
    count, and link density vs the complete graph — the 'one dubious
    bridge' detector run before survivorship."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.review import cluster_cohesion
    from mismo_spark.compare.enum import compare
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    assignments = connected_components(lk.links, docs.select("record_id"))
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    scored = _fs_weights_len().score_compared(
        compare(pairs, _len_comparers())
    )
    out = cluster_cohesion(assignments, scored, weak_odds=1.0)
    return out.select(
        "component",
        "n_records",
        "n_links",
        "n_weak_links",
        F.round("min_odds", 6).alias("min_odds"),
        F.round("avg_odds", 6).alias("avg_odds"),
        F.round("density", 6).alias("density"),
    )


def q_missed_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall review queue: (source, len-bucket) pairs scored >= 50
    whose endpoints landed in different (lang, source) components —
    merges the clustering graph never saw."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.review import missed_merges
    from mismo_spark.compare.enum import compare
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    )
    other = KeyLinker(
        ["source", F.floor(F.col("n_chars") / F.lit(200))], task="dedupe"
    )(docs)
    pairs = Linkage(docs, docs, other.links).links_with_both()
    scored = _fs_weights_len().score_compared(
        compare(pairs, _len_comparers())
    )
    out = missed_merges(assignments, scored, min_odds=50.0)
    return out.select(
        "record_id_l",
        "record_id_r",
        _micro("odds", "odds_micro"),
        "component_l",
        "component_r",
    )


def q_monge_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monge-Elkan hybrid token similarity over blocked pairs (first 12
    tokens a side) — nested HOFs around the JVM levenshtein kernel."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.features import tokenize
    from mismo_spark.text.similarity import monge_elkan
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "lang",
        "source",
        F.slice(tokenize(F.lower(F.col("text"))), 1, 12).alias("toks"),
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(monge_elkan(F.col("toks_l"), F.col("toks_r")), "me_sim_micro"),
    )


def q_soft_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftTFIDF (Cohen et al. 2003) over blocked pairs, first 8 tokens
    a side: rare-token-weighted Jaro-Winkler soft matches — pure
    DataFrame composition over the Arrow JW kernel."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.features import tokenize
    from mismo_spark.text.soft_tfidf import soft_tfidf_pairs

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "lang",
        "source",
        F.slice(tokenize(F.lower(F.col("text"))), 1, 8).alias("tokens"),
    )
    pairs = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    out = soft_tfidf_pairs(pairs, docs, threshold=0.85)
    return out.select(
        "record_id_l",
        "record_id_r",
        _micro("soft_tfidf", "soft_tfidf_micro"),
    )


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: one canonical row per (lang, source) cluster under
    deterministic merge rules (longest text, representative's source,
    modal lang, max n_chars)."""
    from pyspark.sql import Window

    from mismo_spark.cluster.golden import golden_record

    docs = _docs(spark, sf_dir)
    assignments = docs.select(
        "record_id",
        F.min("record_id")
        .over(Window.partitionBy("lang", "source"))
        .alias("component"),
    )
    out = golden_record(
        docs.drop("doc_id"),
        assignments,
        {"text": "longest", "source": "first", "lang": "mode", "n_chars": "max"},
    )
    return out.select(
        "component", "n_records", "text", "source", "lang", "n_chars"
    )


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B|/|A| + Szymkiewicz-Simpson overlap
    over blocked pairs — the quoted-page signal Jaccard misses."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.sets.compare import containment, overlap_coefficient
    from mismo_spark.text.features import tokenize
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "lang",
        "source",
        F.array_distinct(tokenize(F.lower(F.col("text")))).alias("tokens"),
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(
            containment(F.col("tokens_l"), F.col("tokens_r")),
            "containment_lr_micro",
        ),
        _micro(
            overlap_coefficient(F.col("tokens_l"), F.col("tokens_r")),
            "overlap_coef_micro",
        ),
    )


def q_tversky(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tversky index family (mismo_spark/sets/compare.py) over the same
    blocked pairs as q_containment: Dice (α=β=0.5) plus an asymmetric
    prototype-weighted variant (α=0.8, β=0.2)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.sets.compare import dice, tversky
    from mismo_spark.text.features import tokenize
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "lang",
        "source",
        F.array_distinct(tokenize(F.lower(F.col("text")))).alias("tokens"),
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    return pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(dice(F.col("tokens_l"), F.col("tokens_r")), "dice_micro"),
        _micro(
            tversky(F.col("tokens_l"), F.col("tokens_r"), alpha=0.8, beta=0.2),
            "tversky_82_micro",
        ),
    )


def _docs_with_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthesized per-source boilerplate footer line
    (the raw corpus is single-line), so corpus line dedup has real
    repeated lines to remove."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nshared footer line for "),
            F.col("source"),
        ).alias("text"),
    )


def q_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate inventory: every line (>= 3 words) occurring
    >= 2 times corpus-wide, keyed by md5 of its trimmed text."""
    from mismo_spark.textqa.line_dedupe import duplicated_lines

    return duplicated_lines(
        _docs_with_footer(spark, sf_dir), min_words=3, min_count=2
    )


def q_line_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/C4-style corpus line dedup: all occurrences of a
    repeated eligible line except the first (smallest (doc, line_no))
    are removed; the keep rule is one min(struct) aggregation per line
    digest (skew-proof)."""
    from mismo_spark.textqa.line_dedupe import corpus_line_dedupe

    return corpus_line_dedupe(
        _docs_with_footer(spark, sf_dir), min_words=3, min_count=2
    )


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership prefilter for incremental dedup: filter built
    over text-md5 fingerprints (one bit_or groupBy), probed by members
    (never falsely False) and shifted outsiders (FP-rate hits only)."""
    from mismo_spark.dedupe.bloom import bloom_build, bloom_might_contain

    docs = _docs(spark, sf_dir)
    kw = dict(n_bits=1 << 14, n_hashes=3, seed=42)
    fps = docs.select(F.md5("text").alias("fp"))
    bloom = bloom_build(fps, "fp", **kw)
    members = docs.select("record_id", F.md5("text").alias("fp"))
    outsiders = docs.select(
        "record_id",
        F.md5(F.concat(F.col("text"), F.lit("|outsider"))).alias("fp"),
    )
    m = bloom_might_contain(
        members, bloom, "fp", out="member_hit", **kw
    ).select("record_id", "member_hit")
    o = bloom_might_contain(
        outsiders, bloom, "fp", out="outsider_hit", **kw
    ).select("record_id", "outsider_hit")
    return m.join(o, "record_id")


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (SIGMOD'03) partial-overlap candidate pairs: per-doc
    k-gram md5 sequence -> sliding-window minima (rightmost tie) ->
    fingerprint equi-join with a boilerplate df cap.  Hash-matching
    n_shared validates the whole select-then-join chain."""
    from mismo_spark.textqa.winnow import winnow_candidate_pairs

    docs = _docs(spark, sf_dir)
    return winnow_candidate_pairs(docs, k=5, w=4, max_df=50).select(
        "id_l", "id_r", "n_shared"
    )


def q_cluster_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignments at two odds thresholds via the high-to-low
    incremental fold (lowering a threshold only ADDS edges, so each
    step folds just the new band) — oracle recomputes each threshold
    from scratch, checking the fold==full identity itself."""
    from mismo_spark.cluster.thresholds import components_at_thresholds
    from mismo_spark.compare.enum import compare
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    scored = _fs_weights_len().score_compared(
        compare(pairs, _len_comparers())
    )
    out = components_at_thresholds(
        scored.select("record_id_l", "record_id_r", "odds"),
        [50.0, 1.0],
        docs.select("record_id"),
    )
    # integer micro-units: DuckDB's `SELECT 50.0` is DECIMAL(3,1), not
    # DOUBLE — exact-literal multiply keeps the driver hash type-stable
    return out.select(
        (F.col("threshold") * F.lit(1000000.0)).cast("long").alias(
            "threshold_micro"
        ),
        "record_id",
        "component",
    )


def q_cluster_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is the md5
    hash of the dedup COMPONENT, so near-duplicates never straddle a
    boundary — deterministic run-to-run (no rand())."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.splits import cluster_safe_splits

    docs = _docs(spark, sf_dir)
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    )
    out = cluster_safe_splits(
        docs.select("record_id"),
        assignments,
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return out.select("record_id", "component", "split")


_DE_LINE = "der hund ist nicht mit der katze und der maus"


def q_line_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-line language composition
    (mismo_spark/textqa line_lang_fractions): line-level lang_id →
    per-doc fractions, dominant language, multilingual flag.  The raw
    corpus is single-line, so every doc_id % 3 == 0 gets a fixed German
    line appended — those become two-line mixed documents the
    doc-level guess cannot represent."""
    from mismo_spark.textqa import line_lang_fractions

    docs = _docs(spark, sf_dir)
    docs2 = docs.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 3 == 0) & F.col("text").isNotNull(),
            F.concat(F.col("text"), F.lit("\n" + _DE_LINE)),
        ).otherwise(F.col("text")),
    )
    out = line_lang_fractions(docs2, id_col="doc_id", min_fraction=0.2)
    return _micro_wrap(
        out,
        ["doc_id", "n_lines", "dominant_lang", "is_multilingual"],
        ["frac_en", "frac_es", "frac_de", "frac_fr", "frac_und"],
    )


def _line_langs_oracle_sql() -> str:
    g = {
        tag: _lang_markers_sql(words, col="line")
        for tag, words in (("en", _EN), ("es", _ES), ("de", _DE), ("fr", _FR))
    }
    return f"""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
                      THEN text || chr(10) || '{_DE_LINE}'
                      ELSE text END AS text
          FROM documents
        ),
        ne AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM d WHERE text IS NOT NULL
        ),
        nl AS (SELECT doc_id, line FROM ne WHERE trim(line) <> ''),
        scored AS (
          SELECT doc_id, {g['en']} AS s_en, {g['es']} AS s_es,
                 {g['de']} AS s_de, {g['fr']} AS s_fr
          FROM nl
        ),
        guessed AS (
          SELECT doc_id, CASE
            WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
            WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
            WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
            ELSE 'und' END AS l
          FROM scored
        ),
        counts AS (
          SELECT doc_id, count(*) AS n_lines,
                 sum((l = 'en')::INT) AS c_en, sum((l = 'es')::INT) AS c_es,
                 sum((l = 'de')::INT) AS c_de, sum((l = 'fr')::INT) AS c_fr,
                 sum((l = 'und')::INT) AS c_und
          FROM guessed GROUP BY 1
        ),
        stats AS (
          SELECT doc_id, n_lines,
                 round(c_en / n_lines::DOUBLE, 6) AS frac_en,
                 round(c_es / n_lines::DOUBLE, 6) AS frac_es,
                 round(c_de / n_lines::DOUBLE, 6) AS frac_de,
                 round(c_fr / n_lines::DOUBLE, 6) AS frac_fr,
                 round(c_und / n_lines::DOUBLE, 6) AS frac_und,
                 CASE
                   WHEN c_en = greatest(c_en, c_es, c_de, c_fr, c_und)
                     THEN 'en'
                   WHEN c_es = greatest(c_en, c_es, c_de, c_fr, c_und)
                     THEN 'es'
                   WHEN c_de = greatest(c_en, c_es, c_de, c_fr, c_und)
                     THEN 'de'
                   WHEN c_fr = greatest(c_en, c_es, c_de, c_fr, c_und)
                     THEN 'fr'
                   ELSE 'und' END AS dominant_lang,
                 ((c_en / n_lines::DOUBLE >= 0.2)::INT
                  + (c_es / n_lines::DOUBLE >= 0.2)::INT
                  + (c_de / n_lines::DOUBLE >= 0.2)::INT
                  + (c_fr / n_lines::DOUBLE >= 0.2)::INT) >= 2
                   AS is_multilingual
          FROM counts
        )
        SELECT doc.doc_id, coalesce(s.n_lines, 0)::BIGINT AS n_lines,
               coalesce(s.frac_en, 0.0) AS frac_en,
               coalesce(s.frac_es, 0.0) AS frac_es,
               coalesce(s.frac_de, 0.0) AS frac_de,
               coalesce(s.frac_fr, 0.0) AS frac_fr,
               coalesce(s.frac_und, 0.0) AS frac_und,
               coalesce(s.dominant_lang, 'und') AS dominant_lang,
               coalesce(s.is_multilingual, false) AS is_multilingual
        FROM documents doc LEFT JOIN stats s ON s.doc_id = doc.doc_id
    """


def q_date_match_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lib/date.match_level (DOB-style comparer, beyond the reference's
    lib): EXACT / SWAPPED_DAY_MONTH / SAME_MONTH_YEAR / WITHIN_N_DAYS /
    ELSE over perturbed order dates — o_orderkey % 5 picks the
    perturbation (identity, +10d, +3d, +400d, day↔month swap when the
    day fits a month)."""
    from mismo_spark.lib.date import match_level

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d1 = F.to_date(F.col("o_orderdate"))
    k = F.col("o_orderkey")
    swap_ok = F.dayofmonth(d1) <= 12
    d2 = (
        F.when(k % 5 == 0, d1)
        .when(k % 5 == 1, F.date_add(d1, 10))
        .when(k % 5 == 2, F.date_add(d1, 3))
        .when(k % 5 == 3, F.date_add(d1, 400))
        .when(
            swap_ok, F.make_date(F.year(d1), F.dayofmonth(d1), F.month(d1))
        )
        .otherwise(F.date_add(d1, 1))
    )
    return orders.select(
        "o_orderkey",
        d1.alias("d1"),
        d2.alias("d2"),
        match_level(d1, d2).alias("level"),
    )


_DATE_LEVEL_ORACLE_SQL = """
    WITH po AS (
      SELECT o_orderkey, o_orderdate::DATE AS o_orderdate FROM orders
    ),
    pairs AS (
      SELECT o_orderkey, o_orderdate AS d1,
             CASE
               WHEN o_orderkey % 5 = 0 THEN o_orderdate
               WHEN o_orderkey % 5 = 1 THEN o_orderdate + INTERVAL 10 DAY
               WHEN o_orderkey % 5 = 2 THEN o_orderdate + INTERVAL 3 DAY
               WHEN o_orderkey % 5 = 3 THEN o_orderdate + INTERVAL 400 DAY
               WHEN day(o_orderdate) <= 12 THEN
                 make_date(year(o_orderdate)::INT, day(o_orderdate)::INT,
                           month(o_orderdate)::INT)
               ELSE o_orderdate + INTERVAL 1 DAY
             END::DATE AS d2
      FROM po
    )
    SELECT o_orderkey, d1, d2,
           CASE
             WHEN d1 IS NULL OR d2 IS NULL THEN 4
             WHEN d1 = d2 THEN 0
             WHEN year(d1) = year(d2) AND day(d2) = month(d1)
                  AND month(d2) = day(d1) THEN 1
             WHEN year(d1) = year(d2) AND month(d1) = month(d2) THEN 2
             WHEN abs(datediff('day', d2, d1)) <= 7 THEN 3
             ELSE 4
           END AS level
    FROM pairs
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (mismo_spark/chunk.py chunk_documents):
    20-token chunks with 5-token overlap, window arithmetic inside one
    higher-order transform (no shuffle), lineage columns for joining
    chunks back to sources."""
    from mismo_spark.chunk import chunk_documents

    docs = _docs(spark, sf_dir)
    return chunk_documents(docs, chunk_tokens=20, overlap_tokens=5)


_CHUNK_ORACLE_SQL = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    nn AS (SELECT doc_id, t, len(t) AS n FROM tok),
    idx AS (
      SELECT doc_id, t,
             unnest(range(0, CASE WHEN n <= 20 THEN 1
                                  ELSE 1 + ceil((n - 20) / 15.0)::BIGINT
                             END)) AS cid
      FROM nn
    )
    SELECT doc_id, cid::INT AS chunk_id, (cid * 15)::INT AS start_token,
           len(t[cid * 15 + 1 : cid * 15 + 20])::INT AS n_tokens,
           array_to_string(t[cid * 15 + 1 : cid * 15 + 20], ' ')
             AS chunk_text
    FROM idx
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Start-bin sequence packing (mismo_spark/chunk.py
    pack_sequences): whole documents laid out in md5 order per
    language, running token total → (seq_id, seq_offset) — one window
    cumsum, no shuffle beyond the group exchange."""
    from mismo_spark.chunk import pack_sequences
    from mismo_spark.textqa import token_count

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    out = pack_sequences(docs, seq_tokens=1000, by=["lang"], id_col="doc_id")
    return out.select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")


_PACK_ORACLE_SQL = r"""
    WITH d AS (
      SELECT doc_id, lang,
             (CASE WHEN text IS NULL THEN NULL
                   WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+'))
              END)::BIGINT AS n_tokens,
             md5(doc_id::VARCHAR || '|42') AS rk
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS pos
      FROM d
    )
    SELECT doc_id, lang, n_tokens,
           floor(pos / 1000)::BIGINT AS seq_id,
           (pos % 1000)::BIGINT AS seq_offset
    FROM c
"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced training mix
    (mismo_spark/mix.py temperature_sample): 200 docs allocated across
    languages ∝ n_lang^0.5 (largest-remainder apportionment,
    group-size-capped), md5-order selection within each language —
    the low-resource-language lever of a multilingual mix."""
    from mismo_spark.mix import temperature_sample

    docs = _docs(spark, sf_dir).select("record_id", "doc_id", "lang")
    out = temperature_sample(docs, ["lang"], total=200, alpha=0.5)
    return out.select("doc_id", "lang", "n_group", "n_target")


_TEMPERATURE_ORACLE_SQL = """
    WITH counts AS (
      SELECT lang, count(*) AS n_group FROM documents GROUP BY 1
    ),
    ws AS (SELECT sum(pow(n_group, 0.5)) AS wsum FROM counts),
    ideal AS (
      SELECT lang, n_group,
             round(200 * pow(n_group, 0.5) / wsum, 6) AS ideal
      FROM counts CROSS JOIN ws
    ),
    base AS (
      SELECT lang, n_group, floor(ideal)::BIGINT AS b,
             ideal - floor(ideal) AS rem
      FROM ideal
    ),
    alloc AS (
      SELECT lang, n_group,
             least(
               b + (row_number() OVER (ORDER BY rem DESC, lang ASC)
                    <= 200 - (SELECT sum(b) FROM base))::BIGINT,
               n_group
             ) AS n_target
      FROM base
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, a.n_group, a.n_target,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5(d.doc_id::VARCHAR || '|42') ASC
             ) AS rn
      FROM documents d JOIN alloc a USING (lang)
    )
    SELECT doc_id, lang, n_group, n_target
    FROM ranked WHERE rn <= n_target
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit (mismo_spark/splits.py split_leakage_audit):
    count near-dup pairs per (split_l, split_r) boundary.  Splits here
    are deliberately PER-ROW (assign_splits — the leakage-prone naive
    scheme) against KeyLinker(lang, source) pairs, so the audit
    surfaces nonzero cross-split rows; cluster_safe_splits yields zero
    by construction (pytest-pinned)."""
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.splits import assign_splits, split_leakage_audit

    docs = _docs(spark, sf_dir)
    naive = assign_splits(docs, {"train": 0.8, "test": 0.2})
    pairs = KeyLinker(["lang", "source"], task="dedupe")(docs).links
    return split_leakage_audit(naive, pairs)


_SPLIT_LEAKAGE_ORACLE_SQL = """
    WITH d AS (SELECT doc_id, lang, source FROM documents),
    sp AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || '|42'),
                                       1, 8))::BIGINT / 4294967296.0 < 0.8
                  THEN 'train' ELSE 'test' END AS split
      FROM d
    ),
    e AS (
      SELECT a.doc_id AS l, b.doc_id AS r FROM d a JOIN d b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    ),
    t AS (
      SELECT least(sa.split, sb.split) AS split_l,
             greatest(sa.split, sb.split) AS split_r
      FROM e JOIN sp sa ON sa.doc_id = e.l
             JOIN sp sb ON sb.doc_id = e.r
    )
    SELECT split_l, split_r, count(*) AS n_pairs,
           split_l <> split_r AS leaked
    FROM t GROUP BY 1, 2
"""


def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM self-perplexity (the CCNet-style quality screen with
    an in-engine MLE instead of KenLM): vocab-sized LM broadcast into
    one token join, per-doc mean -log p."""
    from mismo_spark.textqa.lm import unigram_perplexity

    docs = _docs(spark, sf_dir)
    out = unigram_perplexity(docs, id_col="doc_id")
    return _micro_wrap(
        out, ["doc_id", "n_tokens"], ["cross_entropy", "perplexity"]
    )


def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity join (Ed-Join q-gram prefix filtering,
    mismo_spark/text/edjoin.py): all pairs of 20-char document prefixes
    within Levenshtein distance 1, recall 1.0 by construction.
    Near-matches are planted (doc_id % 7 == 0 → a copy at id+100000
    with the first character substituted); the oracle is the BRUTE
    FORCE quadratic levenshtein join, so the prefix filter's
    no-false-negatives guarantee is itself value-checked."""
    from mismo_spark.text.edjoin import edit_distance_pairs

    docs = _docs(spark, sf_dir)
    base = docs.select("record_id", F.substring("text", 1, 20).alias("name"))
    pert = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("record_id") + 100000).alias("record_id"),
        F.concat(F.lit("x"), F.substring("text", 2, 19)).alias("name"),
    )
    allr = base.unionByName(pert)
    return edit_distance_pairs(allr, "name", max_distance=1, q=2)


_EDIT_DISTANCE_ORACLE_SQL = """
    WITH base AS (
      SELECT doc_id AS id, substr(text, 1, 20) AS name FROM documents
    ),
    pert AS (
      SELECT doc_id + 100000 AS id, 'x' || substr(text, 2, 19) AS name
      FROM documents WHERE doc_id % 7 = 0
    ),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
    SELECT l.id AS record_id_l, r.id AS record_id_r,
           levenshtein(l.name, r.name) AS distance
    FROM allr l JOIN allr r ON l.id < r.id
    WHERE levenshtein(l.name, r.name) <= 1
"""


def q_edit_distance_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table edit-distance linkage through the linker protocol
    (mismo_spark/linker/edit.py EditDistanceLinker → text/edjoin.py
    edit_distance_link): left = 20-char document prefixes, right = the
    doc_id % 7 == 0 slice with the first character substituted.  Oracle
    = brute-force quadratic cross-table levenshtein join."""
    from mismo_spark.linker.edit import EditDistanceLinker

    docs = _docs(spark, sf_dir)
    left = docs.select("record_id", F.substring("text", 1, 20).alias("name"))
    right = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("record_id") + 100000).alias("record_id"),
        F.concat(F.lit("x"), F.substring("text", 2, 19)).alias("title"),
    )
    linkage = EditDistanceLinker(("name", "title"), max_distance=1)(
        left, right
    )
    return linkage.links


_EDIT_LINK_ORACLE_SQL = """
    WITH l AS (
      SELECT doc_id AS id, substr(text, 1, 20) AS name FROM documents
    ),
    r AS (
      SELECT doc_id + 100000 AS id, 'x' || substr(text, 2, 19) AS title
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT l.id AS record_id_l, r.id AS record_id_r,
           levenshtein(l.name, r.title) AS distance
    FROM l JOIN r ON levenshtein(l.name, r.title) <= 1
"""


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram Stupid-Backoff self-scoring (Brants et al. 2007): seen
    bigrams score ln P(w₂|w₁), unseen back off to α·P_uni(w₂), the
    first token scores its unigram logp — word-ORDER-sensitive quality
    screen (scrambled text keeps its unigram profile but loses its
    bigram fit).  mismo_spark/textqa/lm.py bigram_lm /
    bigram_perplexity."""
    from mismo_spark.textqa.lm import bigram_perplexity

    docs = _docs(spark, sf_dir)
    out = bigram_perplexity(docs, id_col="doc_id")
    return _micro_wrap(
        out, ["doc_id", "n_tokens"], ["cross_entropy", "perplexity"]
    )


_BIGRAM_PPL_ORACLE_SQL = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    uni AS (SELECT unnest(t) AS token FROM tok),
    ucounts AS (SELECT token, count(*) AS n FROM uni GROUP BY 1),
    utot AS (SELECT sum(n) AS total, count(*) AS vocab FROM ucounts),
    ulm AS (
      SELECT token, ln((n + 1.0) / (total + 1.0 * (vocab + 1))) AS logp
      FROM ucounts CROSS JOIN utot
    ),
    uunseen AS (
      SELECT ln(1.0 / (total + 1.0 * (vocab + 1))) AS lp FROM utot
    ),
    bpairs AS (
      SELECT (p).l AS l, (p).r AS r FROM (
        SELECT unnest(list_filter(
          list_transform(t, (x, i) -> CASE WHEN i < len(t)
            THEN {'l': x, 'r': t[i + 1]} END),
          s -> s IS NOT NULL
        )) AS p
        FROM tok
      )
    ),
    c12 AS (SELECT l, r, count(*) AS n12 FROM bpairs GROUP BY 1, 2),
    c1 AS (SELECT l, count(*) AS n1 FROM bpairs GROUP BY 1),
    blm AS (
      SELECT l, r, ln(n12::DOUBLE / n1) AS logp
      FROM c12 JOIN c1 USING (l)
    ),
    stok AS (
      SELECT doc_id, (s).tok AS tok, (s).prev AS prev FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
          {'tok': x, 'prev': CASE WHEN i > 1 THEN t[i - 1] END})) AS s
        FROM tok
      )
    ),
    sc AS (
      SELECT stok.doc_id,
             CASE WHEN blm.logp IS NOT NULL THEN blm.logp
                  WHEN stok.prev IS NOT NULL
                    THEN ln(0.4) + coalesce(ulm.logp, uunseen.lp)
                  ELSE coalesce(ulm.logp, uunseen.lp) END AS lp
      FROM stok
      LEFT JOIN blm ON blm.l = stok.prev AND blm.r = stok.tok
      LEFT JOIN ulm ON ulm.token = stok.tok
      CROSS JOIN uunseen
    ),
    per AS (
      SELECT doc_id, count(*) AS n_tokens, -avg(lp) AS ce
      FROM sc GROUP BY 1
    )
    SELECT d.doc_id, coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
           round(per.ce, 6) AS cross_entropy,
           round(exp(per.ce), 6) AS perplexity
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix quota: at most 5 docs per source, preferring the
    longest, md5-hash tie-broken — deterministic domain balancing."""
    from mismo_spark.mix import top_k_per_group

    docs = _docs(spark, sf_dir).select("record_id", "source", "n_chars")
    return top_k_per_group(
        docs, ["source"], k=5, order_by=[F.col("n_chars").desc()]
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budget: fill 500 tokens per language in
    deterministic md5 order; the crossing doc is included and
    tokens_before records the audit trail."""
    from mismo_spark.mix import token_budget_sample
    from mismo_spark.textqa import token_count

    docs = _docs(spark, sf_dir).select(
        "record_id",
        "lang",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return token_budget_sample(docs, 500, by=["lang"], id_col="record_id")


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile.histogram: distributed equi-width histogram (map +
    one groupBy with partial aggregation), fixed bounds."""
    from mismo_spark.profile import histogram

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = histogram(li, "l_extendedprice", bins=20, lo=0.0, hi=100_000.0)
    return _micro_wrap(out, ["bin", "n"], ["lo", "hi"])


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher A1.1 quality screen (textqa.gopher) with thresholds tuned
    so the synthetic docs split across outcomes."""
    from mismo_spark.textqa.gopher import gopher_rules

    g = gopher_rules(F.col("text"), min_words=20, min_mean_word_len=3.5)
    return _docs(spark, sf_dir).select("doc_id", g.alias("g")).select(
        "doc_id", "g.*"
    )


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann.quant int8 scalar quantization (pinned rounding/division
    order → bit-replayable by the oracle); codes serialized for the
    harness' scalar-cell comparator."""
    from mismo_spark.ann.quant import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.floor(F.col("scale") * F.lit(1e9) + F.lit(0.5))
        .cast("long")
        .alias("scale_nano"),
        F.array_join(F.col("q"), ",").alias("q"),
    )


def q_best_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage.best_match_per_right (window-predicate link filtering,
    mismo/linkage/_linkage.py:248-270): keep each right record's
    max-odds links from the fs_score setup."""
    from mismo_spark.compare.enum import EnumComparer, compare
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    comparers = _len_comparers()
    weights = _fs_weights_len()
    scored = weights.score_compared(compare(pairs, comparers))
    best = Linkage(docs, docs, scored).best_match_per_right("odds")
    return best.links.select(
        "record_id_l", "record_id_r", _micro("odds", "odds_micro")
    )


def q_one_to_one_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 1:1 assignment over JW-scored candidate pairs
    (linker/assignment.py — locally-dominant-edge rounds, bit-identical
    to the sequential greedy scan; enforces both sides jointly, unlike
    Linkage.best_match_* / unambiguous_only, mismo/linkage/
    _linkage.py:248-301).  Scores are quantized to integer micro-units
    BEFORE matching so the greedy order — not just the output — is
    identical in both engines; the DuckDB oracle replays the same
    dominant-edge rounds as a recursive CTE.  Dedupe input (one shared
    id space) so ``dedupe=True``: edges are symmetrized into the node
    view and ranked per NODE across both orientations — a record
    matched as ``record_id_r`` of one pair cannot also match as
    ``record_id_l`` of another (the r4 ADVICE fix)."""
    from mismo_spark.linker.assignment import one_to_one_links
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.similarity import jaro_winkler_similarity
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id", "lang", "source", F.substring("text", 1, 30).alias("prefix")
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    scored = pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(
            jaro_winkler_similarity(F.col("prefix_l"), F.col("prefix_r")),
            "jw_micro",
        ),
    )
    return one_to_one_links(scored, "jw_micro", dedupe=True)


def _docs_factorized_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (record_id, source, tokens: array<long>) where
    tokens are the DISTINCT lowercase word tokens factorized to dense
    integer codes via a one-shot dictionary join.

    r6 perf helper for the canopy/pivot queries: the O(pairs)
    token-Jaccard over array<string> spends its time hashing strings
    into per-pair hash sets (guide §1.2: fix the per-task work);
    factorizing once per RECORD makes the per-PAIR set ops primitive
    (measured 7.6 s → 2.8 s over the 622k source-blocked pairs at
    sf0.1).  The dictionary is ``monotonically_increasing_id`` over
    the distinct tokens — injective by construction and pinned with a
    localCheckpoint, and any injective relabeling preserves every
    |A∩B| / |A∪B|, so downstream similarities (and the oracle results)
    are identical.  Cost: one explode + one join + one groupBy over
    the (record, token) relation — linear in corpus token count."""
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir)
    tok_rows = docs.select(
        "record_id",
        "source",
        F.explode_outer(
            F.array_distinct(tokenize(F.lower(F.col("text"))))
        ).alias("__tok"),
    )
    dic = (
        tok_rows.select("__tok")
        .filter(F.col("__tok").isNotNull())
        .distinct()
        .withColumn("__tid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    return (
        tok_rows.join(dic, "__tok", "left")
        .groupBy("record_id", "source")
        .agg(F.collect_list("__tid").alias("tokens"))
    )


def q_canopy_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canopy clustering (McCallum/Nigam/Ungar 2000; linker/canopy.py)
    over token-Jaccard edges from source-blocked pairs: centers are the
    id-order greedy MIS of the tight (>=0.6) graph via local-minima
    rounds, membership is the loose (>=0.3) join.  Jaccard is an exact
    int/int division so the 0.3/0.6 threshold crossings agree between
    engines bit-for-bit; the DuckDB oracle replays the MIS rounds as a
    recursive CTE over the symmetrized tight graph with self-loops."""
    from mismo_spark.linker.canopy import canopy_assign
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.sets.compare import jaccard
    from mismo_spark.types.linkage import Linkage

    # tokens factorized to dense ints (see _docs_factorized_tokens —
    # jaccard-preserving, makes the per-pair set ops primitive)
    docs = _docs_factorized_tokens(spark, sf_dir)
    lk = KeyLinker(["source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    edges = pairs.select(
        "record_id_l",
        "record_id_r",
        jaccard(F.col("tokens_l"), F.col("tokens_r")).alias("sim"),
    ).filter(F.col("sim") >= 0.3)
    return canopy_assign(edges, docs, sim_col="sim", tight=0.6, loose=0.3)


def q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition via the h-index fixpoint (Lu et al., PNAS
    2016; mismo_spark/graph.py:core_numbers) over the citation graph —
    the node-level dense-kernel rank for cluster QA (core-1 pendants
    are the single-link attachments edge_support flags edge-by-edge).
    Integer-only arithmetic; the oracle replays the same fixpoint as
    ONE recursive CTE, robust to any round count."""
    from mismo_spark.graph import core_numbers

    edges, _ = _citation_edges(spark, sf_dir)
    return core_numbers(edges)


def q_pivot_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KwikCluster pivot correlation clustering (Ailon et al. 2008,
    mismo_spark/cluster/pivot.py) with id-order pivots over the tight
    (>=0.6) token-Jaccard graph: id-order greedy MIS pivots + each
    record joining its smallest adjacent pivot.  The deterministic
    counterweight to connected_components' transitive welding."""
    from mismo_spark.cluster.pivot import pivot_clustering
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.sets.compare import jaccard
    from mismo_spark.types.linkage import Linkage

    # tokens factorized to dense ints (see _docs_factorized_tokens —
    # jaccard-preserving, makes the per-pair set ops primitive)
    docs = _docs_factorized_tokens(spark, sf_dir)
    lk = KeyLinker(["source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    edges = pairs.select(
        "record_id_l",
        "record_id_r",
        jaccard(F.col("tokens_l"), F.col("tokens_r")).alias("sim"),
    ).filter(F.col("sim") >= 0.6)
    return pivot_clustering(edges, docs, sim_col="sim", threshold=0.6)


def q_clk_dice_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving linkage (Schnell et al. 2009, lib/pprl.py):
    CLK Bloom position-set encodings of (c_name, c_mktsegment) per
    customer, nation-blocked pairs scored with the Dice coefficient,
    kept at >= 0.85.  Dice is an exact int/int expression so the
    threshold crossing is engine-identical; positions use the repo's
    cross-engine md5-slice hash family (dedupe/bloom.py:34)."""
    from mismo_spark.lib.pprl import clk_packed_words

    # r6 perf rewrite (same result, asserted by tests/test_pprl.py's
    # dice_packed == dice_positions pin and the unchanged oracle): the
    # O(pairs) Dice is scored on the PACKED 1024-bit form — 16 flat
    # long columns, popcount of the AND-ed words — instead of
    # array_intersect over ~50-element position sets (~8× per pair:
    # 18.3 s → 2.2 s for the 4.5M-pair scan at sf0.1).  |A∩B| via
    # bit_count is exact (positions are distinct, packing is bijective
    # per word) and the denominator keeps the same ints, so the float
    # `2.0 * inter / denom` is bit-identical.  The encoding is
    # materialized ONCE (localCheckpoint) so the md5 position hashing
    # and packing run per record, not per pair side.
    n_words = 16  # 1024 bits / 64
    # Catalyst's constraint propagation goes EXPONENTIAL on the 16-term
    # popcount predicate below: with it on, every action over this plan
    # spends ~7 s of single-threaded DRIVER time deriving constraints
    # from the dice filter (measured: count() 7.7 s → 0.6 s with the
    # rule off, while the probe stage itself is 32 parallel ~0.04 s
    # tasks — this, not execution, was the stage's cost AND its
    # "bimodal" run-to-run variance).  The rule is scoped off for this
    # query only and restored in the finally; the RESULT (pairs >=
    # 0.85, output-sized) is materialized eagerly inside the scope so
    # no later replanning of the big expression can hit the rule again.
    # Optimizer-only setting: rows are identical either way.
    ambient_cp = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        # repartition before the checkpoint: AQE coalesces the encoder's
        # groupBy output to ~1 partition at this size, and the O(pairs)
        # broadcast-join probe below inherits the checkpointed
        # partitioning — without this the whole pair scan runs on one
        # task
        enc = (
            clk_packed_words(
                cust, ["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"]
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint()
        )
        a = enc.select(
            F.col("c_custkey").alias("custkey_l"),
            "c_nationkey",
            *[F.col(f"w{i}").alias(f"__wl{i}") for i in range(n_words)],
            F.col("n").alias("__nl"),
        )
        b = enc.select(
            F.col("c_custkey").alias("custkey_r"),
            "c_nationkey",
            *[F.col(f"w{i}").alias(f"__wr{i}") for i in range(n_words)],
            F.col("n").alias("__nr"),
        )
        # explicit broadcast (guide §3.1): the checkpointed encoding
        # loses size stats, and a fallback sort-merge join on the
        # 25-value nation key would put each nation's whole pair block
        # on one task; the build side is one 136-byte row per customer
        # — the canonical broadcast side at any bench scale
        pairs = a.join(F.broadcast(b), "c_nationkey").filter(
            F.col("custkey_l") < F.col("custkey_r")
        )
        inter = None
        for i in range(n_words):
            term = F.bit_count(F.col(f"__wl{i}").bitwiseAND(F.col(f"__wr{i}")))
            inter = term if inter is None else inter + term
        denom = F.col("__nl") + F.col("__nr")
        dice = F.when(denom == 0, F.lit(0.0)).otherwise(
            2.0 * inter.cast("long") / denom
        )
        out = pairs.filter(dice >= 0.85).select(
            "custkey_l", "custkey_r", _micro(dice, "dice_micro")
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", ambient_cp)


def q_center_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CENTER clustering (Hassanzadeh & Miller 2009,
    mismo_spark/cluster/center.py) over JW-scored candidate pairs:
    strongest pairs seed star clusters, members join by score order.
    Integer micro-unit scores keep the scan order engine-identical;
    the DuckDB oracle replays the decidable-edge rounds as one
    recursive CTE."""
    from mismo_spark.cluster.center import center_clustering
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.similarity import jaro_winkler_similarity
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id", "lang", "source", F.substring("text", 1, 30).alias("prefix")
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    scored = pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(
            jaro_winkler_similarity(F.col("prefix_l"), F.col("prefix_r")),
            "jw_micro",
        ),
    )
    return center_clustering(scored, docs, score_col="jw_micro")


def q_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mutual_best_links (linker/assignment.py): reciprocal-best-hit
    filter — keep pairs that are the top-ranked link of BOTH their
    records under (score DESC, id_l, id_r); round 1 of the greedy 1:1
    assignment, useful as a cheap high-precision filter on its own.
    Dedupe input so ``dedupe=True``: rank per NODE over both edge
    orientations, not per side (the r4 ADVICE fix)."""
    from mismo_spark.linker.assignment import mutual_best_links
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.text.similarity import jaro_winkler_similarity
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir).select(
        "record_id", "lang", "source", F.substring("text", 1, 30).alias("prefix")
    )
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    scored = pairs.select(
        "record_id_l",
        "record_id_r",
        _micro(
            jaro_winkler_similarity(F.col("prefix_l"), F.col("prefix_r")),
            "jw_micro",
        ),
    ).filter(F.col("jw_micro").isNotNull())
    return mutual_best_links(scored, "jw_micro", dedupe=True)


def q_band_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BandLinker (linker/band.py): numeric band blocking |Δn_chars|<=3
    within source — the bucket+adjacent-offset equi-join strategy
    (never an inequality join on Spark), generic sibling of
    TimeWindowLinker; the oracle states the SEMANTICS as the plain
    inequality join DuckDB executes natively (IEJoin)."""
    from mismo_spark.linker.band import BandLinker

    docs = _docs(spark, sf_dir)
    lk = BandLinker("n_chars", band=3, keys=["source"], task="dedupe")(docs)
    return lk.links



def q_strings_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text.strings: strip_accents (translate-table fold, codegen) +
    norm_whitespace over accent-injected, space-padded names."""
    from mismo_spark.text.strings import norm_whitespace, strip_accents

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    raw = F.concat(
        F.lit("  "),
        F.translate(F.col("c_name"), "aeiou", "áéíôü"),
        F.lit(" \t "),
        F.col("c_mktsegment"),
        F.lit("  "),
    )
    return cust.select(
        "c_custkey", norm_whitespace(strip_accents(raw)).alias("normed")
    )


def q_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_util.keep_latest: CDC-style latest-snapshot per key (newest
    event per user), one row_number window — one key-hash shuffle."""
    from mismo_spark._util import keep_latest

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return keep_latest(
        ev, key_col="user_id", ts_col="ts", tiebreak_col="event_id"
    ).select("user_id", "event_id", "ts")


def q_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile.profile_numeric: one-pass multi-column stats (count,
    nulls, distinct, min/max/mean, exact interpolated p50/p95)."""
    from mismo_spark.profile import profile_numeric

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = profile_numeric(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return _micro_wrap(
        out,
        ["column", "n", "n_null", "n_distinct"],
        ["min", "max", "mean", "p50", "p95"],
    )


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line cleaning (textqa.clean.c4_clean_lines) over synthesized
    multi-line pages (terminal-punctuation, min-words, boilerplate
    rules all exercised)."""
    from mismo_spark.textqa.clean import c4_clean_lines

    d = _docs(spark, sf_dir)
    k = F.col("doc_id")
    raw = F.concat_ws(
        "\n",
        F.concat(
            F.lit("Doc "), k.cast("string"), F.lit(" says: "),
            F.substring(F.col("text"), 1, 40), F.lit("."),
        ),
        F.when(
            k % 3 == 0, F.lit("Please enable javascript to continue.")
        ).otherwise(F.lit("Another valid sentence right here.")),
        F.when(k % 4 == 0, F.lit("Short.")).otherwise(
            F.lit("Is this a question?")
        ),
    )
    return d.select("doc_id", c4_clean_lines(raw).alias("cleaned"))


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (textqa.clean.redact_pii): email → <EMAIL>,
    IPv4 → <IP>, phone runs → <PHONE>; patterns in the RE2 ∩ Java
    regex common subset so the oracle replays them verbatim."""
    from mismo_spark.textqa.clean import redact_pii

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    raw = F.concat(
        F.lit("Contact user"), k.cast("string"),
        F.lit("@mail"), (k % 5).cast("string"), F.lit(".example.com or +1 555-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" at 10."), (k % 200).cast("string"), F.lit(".0.1 today."),
    )
    return cust.select("c_custkey", redact_pii(raw).alias("redacted"))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (training-data mixing): keep
    is a pure function of (seed, id, stratum) via md5 arithmetic, so
    the oracle replays membership exactly — map-only, no shuffle."""
    from mismo_spark._util import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir),
        {"en": 0.5, "de": 0.2, "fr": 0.1},
        strata_col="lang",
        id_col="doc_id",
        seed=42,
    ).select("doc_id", "lang")


def q_line_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-line signals (textqa.repetition) —
    shuffle-free array algebra per document."""
    from mismo_spark.textqa.repetition import line_repetition_signals

    out = line_repetition_signals(_docs(spark, sf_dir), id_col="doc_id")
    return _micro_wrap(
        out, ["doc_id"], ["dup_line_frac", "dup_line_char_frac"]
    )


def q_paragraph_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table A1 line AND paragraph duplication signals in one
    map-only pass (textqa.repetition line_repetition_signals with
    paragraphs=True — the \\n\\n-delimited variants)."""
    from mismo_spark.textqa.repetition import line_repetition_signals

    out = line_repetition_signals(
        _docs(spark, sf_dir), id_col="doc_id", paragraphs=True
    )
    return _micro_wrap(
        out,
        ["doc_id"],
        [
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_paragraph_frac",
            "dup_paragraph_char_frac",
        ],
    )


def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top/duplicated word-2-gram char fractions (textqa.repetition):
    explode → per-(doc, gram) count → per-doc rollup, doc-keyed
    shuffles only."""
    from mismo_spark.textqa.repetition import ngram_repetition_signals

    out = ngram_repetition_signals(_docs(spark, sf_dir), n=2, id_col="doc_id")
    return _micro_wrap(
        out, ["doc_id"], ["top_ngram_char_frac", "dup_ngram_char_frac"]
    )


def q_email_match_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """email match_level (mismo/lib/email/_core.py:93-133): customer
    emails vs a deterministic mutation."""
    from mismo_spark.lib.email import match_level

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    e1 = F.concat(F.lower(F.regexp_replace(F.col("c_name"), "#", "")), F.lit("@example.com"))
    # mutate: last digit of the name swapped for 'x' when key is even
    e2 = F.when(
        F.col("c_custkey") % 2 == 0,
        F.concat(
            F.expr("substring(lower(replace(c_name, '#', '')), 1, length(c_name) - 2)"),
            F.lit("x@example.com"),
        ),
    ).otherwise(e1)
    return cust.select(
        "c_custkey", match_level(e1, e2).cast("long").alias("email_level")
    )


_GIVENS = [
    "WILLIAM", "ROBERT", "RICHARD", "MARGARET", "ELIZABETH",
    "JAMES", "JOHN", "KATHERINE", "MICHAEL",
]
_SURNAMES = ["SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA", "MILLER"]
_NICK_OF = {
    "WILLIAM": "BILL", "ROBERT": "BOB", "RICHARD": "DICK",
    "MARGARET": "PEGGY", "ELIZABETH": "BETH", "JAMES": "JIM",
    "JOHN": "JACK", "KATHERINE": "KATE", "MICHAEL": "MIKE",
}


def q_name_match_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NameComparer levels (mismo/lib/name/_compare.py:53-129) on
    deterministic name mutations: per customer key, the right-side name
    is EXACT / prefix-only-diff / nickname / typo / initial / different /
    null — exercising every level incl. the reference's TYPO-before-
    INITIALS case order."""
    from mismo_spark.lib.name import name_match_level

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    giv = F.element_at(F.array(*[F.lit(g) for g in _GIVENS]), (k % 9 + 1).cast("int"))
    sur = F.element_at(
        F.array(*[F.lit(s) for s in _SURNAMES]), (k % 7 + 1).cast("int")
    )
    giv2_alt = F.element_at(
        F.array(*[F.lit(g) for g in _GIVENS]), ((k + 4) % 9 + 1).cast("int")
    )
    m = k % 7
    nick = giv
    for canon, n in _NICK_OF.items():
        nick = F.when(giv == canon, F.lit(n)).otherwise(nick)
    g2 = (
        F.when(m == 2, nick)
        .when(m == 3, F.concat(F.substring(giv, 1, 1), F.substring(giv, 3, 50)))
        .when(m == 4, F.substring(giv, 1, 1))
        .when(m == 5, giv2_alt)
        .when(m == 6, F.lit(None).cast("string"))
        .otherwise(giv)
    )
    p2 = F.when(m == 1, F.lit("MR")).otherwise(F.lit(""))
    empty = F.lit("")
    name_l = F.struct(
        empty.alias("prefix"), giv.alias("given"), empty.alias("middle"),
        sur.alias("surname"), empty.alias("suffix"), empty.alias("nickname"),
    )
    name_r = F.struct(
        p2.alias("prefix"), g2.alias("given"), empty.alias("middle"),
        sur.alias("surname"), empty.alias("suffix"), empty.alias("nickname"),
    )
    pairs = cust.select(
        "c_custkey", name_l.alias("name_l"), name_r.alias("name_r")
    )
    return pairs.select(
        "c_custkey",
        name_match_level(F.col("name_l"), F.col("name_r"))
        .cast("long")
        .alias("name_level"),
    )


def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """haversine distance_km (mismo/lib/geo/_latlon.py:16-57) on
    synthesized coordinates."""
    from mismo_spark.lib.geo import distance_km

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lat = (F.col("c_custkey") % 170).cast("double") - 85.0 + 0.5
    lon = ((F.col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5
    return cust.select(
        "c_custkey",
        _micro(
            distance_km(lat1=lat, lon1=lon, lat2=F.lit(40.7), lon2=F.lit(-74.0)),
            "dist_km_micro",
        ),
    )


def q_diff_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff/Updates (mismo/types/_diff.py:19-165): before/after orders
    reconciliation with value_change categories."""
    from mismo_spark.types.diff import diff_tables, value_change

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    before = orders.filter(F.col("o_orderkey") % 7 != 0)
    after = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
        ).otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % 11 != 0)
    d = diff_tables(before, after, "o_orderkey")
    return d.updates.select(
        "o_orderkey", value_change(F.col("o_totalprice")).alias("change")
    )


def q_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiffStats (mismo/types/_diff.py:294-340): the six-way row-count
    summary of the same before/after orders reconciliation as
    q_diff_updates — insertions / deletions / updates / unchanged plus
    the derived before/after totals."""
    from mismo_spark.types.diff import diff_tables

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    before = orders.filter(F.col("o_orderkey") % 7 != 0)
    after = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
        ).otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % 11 != 0)
    s = diff_tables(before, after, "o_orderkey").stats()
    rows = [
        (
            s.n_before(),
            s.n_after(),
            s.n_insertions(),
            s.n_deletions(),
            s.n_updates(),
            s.n_unchanged(),
        )
    ]
    return spark.createDataFrame(
        rows,
        "n_before long, n_after long, n_insertions long, n_deletions long,"
        " n_updates long, n_unchanged long",
    )


_DIFF_STATS_ORACLE_SQL = """
    WITH b AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ),
    a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0
                  THEN round(o_totalprice + 1.0, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    j AS (
      SELECT b.o_orderkey AS bk, a.o_orderkey AS ak,
             b.o_totalprice AS bp, a.o_totalprice AS ap
      FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
    ),
    c AS (
      SELECT
        count(*) FILTER (bk IS NULL) AS ins,
        count(*) FILTER (ak IS NULL) AS del,
        count(*) FILTER (
          bk IS NOT NULL AND ak IS NOT NULL
          AND NOT (bp IS NOT DISTINCT FROM ap)
        ) AS upd,
        count(*) FILTER (
          bk IS NOT NULL AND ak IS NOT NULL
          AND (bp IS NOT DISTINCT FROM ap)
        ) AS unch
      FROM j
    )
    SELECT CAST(del + upd + unch AS BIGINT) AS n_before,
           CAST(ins + upd + unch AS BIGINT) AS n_after,
           CAST(ins AS BIGINT) AS n_insertions,
           CAST(del AS BIGINT) AS n_deletions,
           CAST(upd AS BIGINT) AS n_updates,
           CAST(unch AS BIGINT) AS n_unchanged
    FROM c
"""


def q_tf_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF add_frequencies (mismo/tf/_tf.py:60-92) over mktsegment."""
    from mismo_spark.tf import add_frequencies

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    out = add_frequencies(cust, "c_mktsegment")
    return out.select(
        "c_custkey",
        "c_mktsegment",
        _micro("c_mktsegment_frequency", "freq_micro"),
    )


def _py_micro(p: float) -> int:
    """Python-side mirror of :func:`_micro` for driver-computed scalars
    (CPython floats ARE IEEE doubles, so ``p * 1000000.0 + 0.5`` then
    ``floor`` is the identical op sequence the oracle runs in SQL)."""
    import math

    return int(math.floor(p * 1000000.0 + 0.5))


def q_level_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fs.train.level_proportions (mismo/fs/_train.py:17-41): add-1
    smoothed agreement-level proportions over the (lang, source)
    blocked pairs.  The K-float driver list is re-emitted as a
    DataFrame in micro units (_py_micro = the oracle's exact IEEE op
    sequence, so the driver hash is engine-stable)."""
    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.train import level_proportions
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.linkage import Linkage

    docs = _docs(spark, sf_dir)
    lk = KeyLinker(["lang", "source"], task="dedupe")(docs)
    pairs = Linkage(docs, docs, lk.links).links_with_both()
    cmp_ = _len_comparers()[0]
    compared = compare(pairs, [cmp_])
    props = level_proportions(compared, cmp_)
    rows = [(lev, _py_micro(p)) for lev, p in enumerate(props)]
    return spark.createDataFrame(rows, "level long, prop_micro long")


def q_train_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fs.train.train_using_labels (mismo/fs/_train.py:226-268): m from
    the label_true equi-join (label = doc_id % 37), u from
    sample_all_links' bounded pair sample.  The docs subset is capped
    under 1000 rows per side so the sqrt(max_pairs) hash-sample keeps
    EVERY id and both estimates replay exactly in SQL (no xxhash64
    ordering reaches the result)."""
    from mismo_spark.fs.train import train_using_labels

    docs = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 6300))
        .withColumn("label_true", F.col("doc_id") % 37)
    )
    comparers = _len_comparers()
    w = train_using_labels(comparers, docs, docs, max_pairs=1_000_000)
    rows = []
    for c in comparers:
        for lev in range(len(c.level_names)):
            lw = w[c.name][lev]
            rows.append((c.name, lev, _py_micro(lw.m), _py_micro(lw.u)))
    return spark.createDataFrame(
        rows, "comparer string, level long, m_micro long, u_micro long"
    )


def q_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cluster.metrics.bcubed_prf (Bagga & Baldwin 1998) of the
    (lang, source) clustering against shared-50-char-fingerprint truth
    — the one-joint-groupBy formulation (Σ o²/|c|, Σ o²/|t|), no
    per-record work.  The one-row score is re-emitted in micro units
    via _py_micro."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.metrics import bcubed_prf
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "label_true", F.coalesce(F.substring("text", 1, 50), F.lit(""))
    )
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    )
    a = assignments.join(docs.select("record_id", "label_true"), "record_id")
    d = bcubed_prf(a)
    rows = [
        (
            int(d["n"]),
            _py_micro(d["precision"]),
            _py_micro(d["recall"]),
            _py_micro(d["f1"]),
        )
    ]
    return spark.createDataFrame(
        rows, "n long, precision_micro long, recall_micro long, f1_micro long"
    )


def q_full_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FullLinker (mismo/linker/_basic.py:11-25): all n(n−1)/2 dedupe
    pairs of a bounded subset (the contract: FullLinker is only for
    inputs small enough to cross)."""
    from mismo_spark.linker.basic import FullLinker

    sub = _docs(spark, sf_dir).filter(F.col("doc_id") % 101 == 0)
    return FullLinker(task="dedupe")(sub).links


def q_empty_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmptyLinker (mismo/linker/_basic.py:28-40): zero pairs with the
    correctly-typed links schema."""
    from mismo_spark.linker.basic import EmptyLinker

    return EmptyLinker(task="dedupe")(_docs(spark, sf_dir)).links


def _em_comparers():
    """_len_comparers plus a 2-level lang-equality comparer so the EM
    joint histogram is a genuine 3×2 pattern table (joint ≠ product of
    marginals — exercises the joint-histogram formulation, not just
    per-dimension proportions)."""
    from mismo_spark.compare.enum import EnumComparer

    return _len_comparers() + [
        EnumComparer(
            "lang_cmp",
            [("same", lambda df: df["lang_l"] == df["lang_r"])],
        ),
    ]


def q_train_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fs.em.train_using_em (mismo/fs/_train_em.py:17-93): 5 fixed EM
    iterations over the joint (len-level, lang-level) agreement-pattern
    histogram of all ordered pairs of a bounded docs subset (doc_id
    %7 == 0 → every id survives sample_all_links' sqrt(max_pairs)
    hash-sample, so no xxhash64 ordering reaches the result).  The
    oracle unrolls init + all 5 iterations as MATERIALIZED CTEs over
    the same histogram — m/u per level value-checked end-to-end in
    micro units (_py_micro = the identical IEEE op sequence)."""
    from mismo_spark.fs.em import train_using_em

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    comparers = _em_comparers()
    w = train_using_em(comparers, docs, docs, max_pairs=1_000_000, seed=42)
    rows = []
    for c in comparers:
        cw = w[c.name]
        for lev in range(len(c.level_names)):
            lw = cw[lev]
            rows.append((c.name, lev, _py_micro(lw.m), _py_micro(lw.u)))
    return spark.createDataFrame(
        rows, "comparer string, level long, m_micro long, u_micro long"
    )


def _train_em_oracle_sql(*, iterations: int = 5, threshold: float = 10.0) -> str:
    """DuckDB replay of q_train_em: the joint 3×2 pattern histogram,
    then init + ``iterations`` EM rounds unrolled as MATERIALIZED CTEs
    (DuckDB inlines multiply-referenced plain CTEs — the unrolled
    iteration chain would re-expand the pair cross-join exponentially
    otherwise).  All divisions are ``::DOUBLE`` two-operand ops in the
    same order as the driver-side Python loop, so every m/u is
    IEEE-identical before the final micro quantization."""
    parts = [
        """
        WITH s AS MATERIALIZED (
          SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 7 = 0
        ),
        pat AS MATERIALIZED (
          SELECT CASE WHEN a.n_chars = b.n_chars THEN 0
                      WHEN abs(a.n_chars - b.n_chars) <= 20 THEN 1
                      ELSE 2 END AS l1,
                 CASE WHEN a.lang = b.lang THEN 0 ELSE 1 END AS l2
          FROM s a CROSS JOIN s b WHERE a.doc_id <> b.doc_id
        ),
        grid AS MATERIALIZED (
          SELECT g1.l1, g2.l2
          FROM (SELECT unnest([0, 1, 2]) AS l1) g1
          CROSS JOIN (SELECT unnest([0, 1]) AS l2) g2
        ),
        joint AS MATERIALIZED (
          SELECT grid.l1, grid.l2, coalesce(c.n, 0)::BIGINT AS n
          FROM grid LEFT JOIN (
            SELECT l1, l2, count(*) AS n FROM pat GROUP BY l1, l2
          ) c USING (l1, l2)
        ),
        mar1_0 AS MATERIALIZED (SELECT l1 AS level, sum(n) AS raw FROM joint GROUP BY l1),
        sm1_0 AS MATERIALIZED (
          SELECT level, CASE WHEN raw = 0 THEN 1 ELSE raw END AS c FROM mar1_0
        ),
        w1_0 AS MATERIALIZED (
          SELECT level, 1::DOUBLE / 3 AS m,
                 c::DOUBLE / (SELECT sum(c) FROM sm1_0) AS u
          FROM sm1_0
        ),
        mar2_0 AS MATERIALIZED (SELECT l2 AS level, sum(n) AS raw FROM joint GROUP BY l2),
        sm2_0 AS MATERIALIZED (
          SELECT level, CASE WHEN raw = 0 THEN 1 ELSE raw END AS c FROM mar2_0
        ),
        w2_0 AS MATERIALIZED (
          SELECT level, 1::DOUBLE / 2 AS m,
                 c::DOUBLE / (SELECT sum(c) FROM sm2_0) AS u
          FROM sm2_0
        )"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
        p{k} AS MATERIALIZED (
          SELECT j.l1, j.l2, j.n,
                 ((a.m / a.u) * (b.m / b.u) >= {threshold}) AS is_match
          FROM joint j
          JOIN w1_{p} a ON a.level = j.l1
          JOIN w2_{p} b ON b.level = j.l2
        ),
        mar1_{k} AS MATERIALIZED (
          SELECT l1 AS level,
                 sum(CASE WHEN is_match THEN n ELSE 0 END) AS mraw,
                 sum(CASE WHEN is_match THEN 0 ELSE n END) AS uraw
          FROM p{k} GROUP BY l1
        ),
        sm1_{k} AS MATERIALIZED (
          SELECT level,
                 CASE WHEN mraw = 0 THEN 1 ELSE mraw END AS mc,
                 CASE WHEN uraw = 0 THEN 1 ELSE uraw END AS uc
          FROM mar1_{k}
        ),
        w1_{k} AS MATERIALIZED (
          SELECT level, mc::DOUBLE / (SELECT sum(mc) FROM sm1_{k}) AS m,
                 uc::DOUBLE / (SELECT sum(uc) FROM sm1_{k}) AS u
          FROM sm1_{k}
        ),
        mar2_{k} AS MATERIALIZED (
          SELECT l2 AS level,
                 sum(CASE WHEN is_match THEN n ELSE 0 END) AS mraw,
                 sum(CASE WHEN is_match THEN 0 ELSE n END) AS uraw
          FROM p{k} GROUP BY l2
        ),
        sm2_{k} AS MATERIALIZED (
          SELECT level,
                 CASE WHEN mraw = 0 THEN 1 ELSE mraw END AS mc,
                 CASE WHEN uraw = 0 THEN 1 ELSE uraw END AS uc
          FROM mar2_{k}
        ),
        w2_{k} AS MATERIALIZED (
          SELECT level, mc::DOUBLE / (SELECT sum(mc) FROM sm2_{k}) AS m,
                 uc::DOUBLE / (SELECT sum(uc) FROM sm2_{k}) AS u
          FROM sm2_{k}
        )"""
        )
    n = iterations
    parts.append(
        f"""
        SELECT 'len_cmp' AS comparer, level::BIGINT AS level,
               CAST(floor(m * 1000000 + 0.5) AS BIGINT) AS m_micro,
               CAST(floor(u * 1000000 + 0.5) AS BIGINT) AS u_micro
        FROM w1_{n}
        UNION ALL
        SELECT 'lang_cmp' AS comparer, level::BIGINT AS level,
               CAST(floor(m * 1000000 + 0.5) AS BIGINT) AS m_micro,
               CAST(floor(u * 1000000 + 0.5) AS BIGINT) AS u_micro
        FROM w2_{n}"""
    )
    return "".join(parts)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (mismo_spark/ann/ivf.py: ivf_assign +
    ivf_topk) with the SQL-replayable seed-centroid source
    (semdedup.seed_centroids — the 4 lowest-id vectors, zero Lloyd
    iterations, so the oracle re-derives the centroids from the table):
    assignment = argmax-cosine cell per corpus vector, queries (every
    25th vector, perturbed as in q_lsh_topk) probe their n_probe=2
    nearest cells, exact-cosine re-rank to top-5.  Cell assignment,
    probe selection AND the re-rank are all value-checked; k-means
    TRAINING (Lloyd iterations) stays pytest-gated
    (tests/test_round5.py recall + partition-prune plan tests) as the
    genuinely iterative part."""
    from mismo_spark.ann.ivf import ivf_assign, ivf_topk
    from mismo_spark.ann.semdedup import seed_centroids

    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    corpus = emb.select("vec_id", v.alias("embedding"))
    centroids = seed_centroids(corpus, 4)
    indexed = ivf_assign(corpus, centroids)
    pert = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, 63)
    )
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"), pert.alias("embedding")
    )
    out = ivf_topk(indexed, queries, centroids, k=5, n_probe=2)
    return out.select(
        "query_id", "neighbour_id", _micro("cosine", "cosine_micro")
    )


_IVF_TOPK_ORACLE_SQL = """
    WITH c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cents AS (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS cv
      FROM (SELECT * FROM c ORDER BY id LIMIT 4)
    ),
    q AS (
      SELECT id + 200000 AS id, [v[1] + 0.05] || v[2:] AS v
      FROM c WHERE id % 25 = 0
    ),
    csim AS (
      SELECT c.id, cents.cell,
             list_dot_product(c.v, cents.cv)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(cents.cv, cents.cv))) AS cc
      FROM c CROSS JOIN cents
    ),
    assign AS (
      SELECT id, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY id ORDER BY cc DESC, cell ASC
        ) AS rn FROM csim
      ) WHERE rn = 1
    ),
    qsim AS (
      SELECT q.id, cents.cell,
             list_dot_product(q.v, cents.cv)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(cents.cv, cents.cv))) AS cc
      FROM q CROSS JOIN cents
    ),
    probe AS (
      SELECT id, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY id ORDER BY cc DESC, cell ASC
        ) AS rn FROM qsim
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT probe.id AS query_id, assign.id AS neighbour_id
      FROM probe JOIN assign ON probe.cell = assign.cell
      WHERE probe.id <> assign.id
    ),
    scored AS (
      SELECT query_id, neighbour_id,
             list_dot_product(qv.v, cv.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(cv.v, cv.v))) AS cosine
      FROM cand
      JOIN q qv ON qv.id = cand.query_id
      JOIN c cv ON cv.id = cand.neighbour_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbour_id ASC
      ) AS rn
      FROM scored
    )
    SELECT query_id, neighbour_id,
           CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_micro
    FROM ranked WHERE rn <= 5
"""


def q_pairwise_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering scorecard in one row: distributed pairwise
    precision/recall/F1 (cluster/metrics.pairwise_prf — the north-rule
    F1 ≥ 0.99 gate metric, computed from cluster sizes without
    materializing pairs) plus adjusted Rand and Fowlkes-Mallows
    (cluster/eval.py, sklearn-equivalent driver-side forms), of the
    (lang, source) clustering against shared-50-char-fingerprint truth.
    Every intermediate (comb2 sums over the contingency table) is an
    exact integer in float64, so tp/pred/true hash as BIGINTs and the
    ratios are IEEE-identical before micro quantization."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.eval import adjusted_rand_score, fowlkes_mallows
    from mismo_spark.cluster.metrics import pairwise_prf
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "label_true", F.coalesce(F.substring("text", 1, 50), F.lit(""))
    )
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    ).join(docs.select("record_id", "label_true"), "record_id")
    d = pairwise_prf(assignments)
    ari = adjusted_rand_score(assignments)
    fm = fowlkes_mallows(assignments)
    rows = [
        (
            int(d["tp"]),
            int(d["pred_pairs"]),
            int(d["true_pairs"]),
            _py_micro(d["precision"]),
            _py_micro(d["recall"]),
            _py_micro(d["f1"]),
            _py_micro(ari),
            _py_micro(fm),
        )
    ]
    return spark.createDataFrame(
        rows,
        "tp long, pred_pairs long, true_pairs long, precision_micro long,"
        " recall_micro long, f1_micro long, ari_micro long, fm_micro long",
    )


_PAIRWISE_EVAL_ORACLE_SQL = """
    WITH a AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY lang, source) AS component,
             coalesce(substr(text, 1, 50), '') AS label_true
      FROM documents
    ),
    cells AS (
      SELECT component, label_true, count(*) AS o
      FROM a GROUP BY component, label_true
    ),
    cs AS (SELECT component, count(*) AS nc FROM a GROUP BY component),
    ts AS (SELECT label_true, count(*) AS nt FROM a GROUP BY label_true),
    agg AS (
      SELECT (SELECT sum(o * (o - 1) / 2) FROM cells) AS tp,
             (SELECT sum(nc * (nc - 1) / 2) FROM cs) AS pred,
             (SELECT sum(nt * (nt - 1) / 2) FROM ts) AS trueb,
             (SELECT count(*) FROM a) AS n
    ),
    m AS (
      SELECT tp, pred, trueb, n,
             CASE WHEN pred > 0 THEN tp / pred ELSE 1.0::DOUBLE END AS p,
             CASE WHEN trueb > 0 THEN tp / trueb ELSE 1.0::DOUBLE END AS r,
             -- ARI: contingency rows = true, cols = pred
             n * (n - 1) / 2 AS total
      FROM agg
    ),
    m2 AS (
      SELECT *,
             CASE WHEN (p + r) > 0 THEN 2 * p * r / (p + r)
                  ELSE 0.0::DOUBLE END AS f1,
             CASE WHEN total > 0 THEN trueb * pred / total
                  ELSE 0.0::DOUBLE END AS expected,
             (trueb + pred) / 2 AS max_index
      FROM m
    ),
    m3 AS (
      SELECT *,
             CASE WHEN max_index = expected THEN 1.0::DOUBLE
                  ELSE (tp - expected) / (max_index - expected) END AS ari,
             CASE WHEN pred = 0 OR trueb = 0 THEN 0.0::DOUBLE
                  ELSE tp / sqrt(pred * trueb) END AS fm
      FROM m2
    )
    SELECT CAST(tp AS BIGINT) AS tp,
           CAST(pred AS BIGINT) AS pred_pairs,
           CAST(trueb AS BIGINT) AS true_pairs,
           CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS precision_micro,
           CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS recall_micro,
           CAST(floor(f1 * 1000000 + 0.5) AS BIGINT) AS f1_micro,
           CAST(floor(ari * 1000000 + 0.5) AS BIGINT) AS ari_micro,
           CAST(floor(fm * 1000000 + 0.5) AS BIGINT) AS fm_micro
    FROM m3
"""


def q_entropy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-theoretic clustering scores (cluster/eval.py,
    sklearn-equivalent): homogeneity / completeness / V-measure and NMI
    of the same (lang, source)-vs-fingerprint clustering as
    q_pairwise_eval.  Entropies and MI replay in SQL as Σ p·ln(p) over
    the contingency table; summation order can differ between numpy and
    the SQL aggregate by ~1 ULP per term, which the micro quantization
    absorbs (boundary-straddle probability ~1e-9 per value)."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.eval import (
        homogeneity_completeness_v,
        normalized_mutual_info,
    )
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "label_true", F.coalesce(F.substring("text", 1, 50), F.lit(""))
    )
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    ).join(docs.select("record_id", "label_true"), "record_id")
    hcv = homogeneity_completeness_v(assignments)
    nmi = normalized_mutual_info(assignments)
    rows = [
        (
            _py_micro(hcv["homogeneity"]),
            _py_micro(hcv["completeness"]),
            _py_micro(hcv["v_measure"]),
            _py_micro(nmi),
        )
    ]
    return spark.createDataFrame(
        rows,
        "homogeneity_micro long, completeness_micro long,"
        " v_measure_micro long, nmi_micro long",
    )


_ENTROPY_EVAL_ORACLE_SQL = """
    WITH a AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY lang, source) AS component,
             coalesce(substr(text, 1, 50), '') AS label_true
      FROM documents
    ),
    cells AS (
      SELECT component, label_true, count(*) AS o
      FROM a GROUP BY component, label_true
    ),
    cs AS (SELECT component, count(*) AS nc FROM a GROUP BY component),
    ts AS (SELECT label_true, count(*) AS nt FROM a GROUP BY label_true),
    n AS (SELECT count(*) AS n FROM a),
    ent AS (
      SELECT
        (SELECT -sum((nt / n.n) * ln(nt / n.n)) FROM ts, n) AS h_true,
        (SELECT -sum((nc / n.n) * ln(nc / n.n)) FROM cs, n) AS h_pred,
        (SELECT sum((o / n.n) * ln((n.n * o) / (nt * nc)))
         FROM cells
         JOIN ts USING (label_true) JOIN cs USING (component), n) AS mi
    ),
    hc AS (
      SELECT
        CASE WHEN h_true <> 0 THEN mi / h_true ELSE 1.0::DOUBLE END AS h,
        CASE WHEN h_pred <> 0 THEN mi / h_pred ELSE 1.0::DOUBLE END AS c,
        CASE WHEN (h_true + h_pred) <> 0
             THEN mi / ((h_true + h_pred) / 2)
             ELSE 1.0::DOUBLE END AS nmi
      FROM ent
    )
    SELECT
      CAST(floor(h * 1000000 + 0.5) AS BIGINT) AS homogeneity_micro,
      CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS completeness_micro,
      CAST(floor(
        CASE WHEN (h + c) <> 0 THEN 2 * h * c / (h + c)
             ELSE 0.0::DOUBLE END * 1000000 + 0.5) AS BIGINT)
        AS v_measure_micro,
      CAST(floor(nmi * 1000000 + 0.5) AS BIGINT) AS nmi_micro
    FROM hc
"""


def q_rand_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Rand index + raw mutual information
    (cluster/eval.py rand_score / mutual_info_score,
    mismo/cluster/_eval.py:122-169) of the same clustering as
    q_pairwise_eval — the two remaining SQL-expressible sklearn-family
    scores (AMI's hypergeometric E[MI] term is driver-side only and
    stays pytest-gated)."""
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.eval import mutual_info_score, rand_score
    from mismo_spark.linker.key import KeyLinker

    docs = _docs(spark, sf_dir).withColumn(
        "label_true", F.coalesce(F.substring("text", 1, 50), F.lit(""))
    )
    assignments = connected_components(
        KeyLinker(["lang", "source"], task="dedupe")(docs).links,
        docs.select("record_id"),
    ).join(docs.select("record_id", "label_true"), "record_id")
    rows = [
        (
            _py_micro(rand_score(assignments)),
            _py_micro(mutual_info_score(assignments)),
        )
    ]
    return spark.createDataFrame(rows, "rand_micro long, mi_micro long")


_RAND_MI_ORACLE_SQL = """
    WITH a AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY lang, source) AS component,
             coalesce(substr(text, 1, 50), '') AS label_true
      FROM documents
    ),
    cells AS (
      SELECT component, label_true, count(*) AS o
      FROM a GROUP BY component, label_true
    ),
    cs AS (SELECT component, count(*) AS nc FROM a GROUP BY component),
    ts AS (SELECT label_true, count(*) AS nt FROM a GROUP BY label_true),
    agg AS (
      SELECT (SELECT sum(o * (o - 1) / 2) FROM cells) AS tp,
             (SELECT sum(nc * (nc - 1) / 2) FROM cs) AS pred,
             (SELECT sum(nt * (nt - 1) / 2) FROM ts) AS trueb,
             (SELECT count(*) FROM a) AS n,
             (SELECT sum((o / nn.n) * ln((nn.n * o) / (nt * nc)))
              FROM cells
              JOIN ts USING (label_true) JOIN cs USING (component),
              (SELECT count(*) AS n FROM a) nn) AS mi
    )
    SELECT
      CAST(floor(
        CASE WHEN n * (n - 1) / 2 = 0 THEN 1.0::DOUBLE
             ELSE (n * (n - 1) / 2 + 2 * tp - trueb - pred)
                  / (n * (n - 1) / 2) END * 1000000 + 0.5) AS BIGINT)
        AS rand_micro,
      CAST(floor(mi * 1000000 + 0.5) AS BIGINT) AS mi_micro
    FROM agg
"""


def q_updates_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Updates.from_tables + apply_to roundtrip
    (mismo/types/_updates.py:192-375): rows only in `before` keep their
    old values, rows in both take the after values."""
    from mismo_spark.types.updates import Updates

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    # +1.0 is binary-exact, so the mutated price is bit-identical on
    # both engines (a round(x, 2) here would reintroduce the HALF_UP
    # divergence the _micro quantization exists to avoid)
    after = orders.filter(k % 11 != 0).withColumn(
        "o_totalprice",
        F.when(k % 10 == 0, F.col("o_totalprice") + F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    u = Updates.from_tables(orders, after, join_on="o_orderkey")
    res = u.apply_to(orders)
    return res.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_centi"),
    )


def q_emails_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmailsDimension.prepare + compare (mismo/lib/email/_core.py:136-212):
    best match level over all l×r email combinations, exercising every
    EmailMatchLevel via deterministic mutations of c_custkey."""
    from mismo_spark.lib.email import EmailsDimension, clean_email, parse_email

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    m = k % 5
    user = F.concat(F.lit("user"), (k % 97).cast("string"))
    user_r = (
        F.when(m == 1, F.concat(user, F.lit("x")))
        .when(m == 3, F.concat(user, F.lit("q")))
        .when(m == 4, F.concat(F.lit("zz"), (k % 13).cast("string")))
        .otherwise(user)
    )
    dom_r = F.when(m >= 2, F.lit("@other.org")).otherwise(F.lit("@mail.com"))
    emails_l = F.array(
        F.concat(user, F.lit("@mail.com")),
        F.concat(F.lit("alt"), (k % 7).cast("string"), F.lit("@mail.com")),
    )
    emails_r = F.array(F.concat(user_r, dom_r))

    def parse(col):
        return F.filter(
            F.transform(col, lambda e: parse_email(clean_email(e, normalize=True))),
            lambda p: p["full"].isNotNull(),
        )

    dim = EmailsDimension("emails")
    t = cust.select(
        "c_custkey",
        parse(emails_l).alias(dim.column_parsed + "_l"),
        parse(emails_r).alias(dim.column_parsed + "_r"),
    )
    return dim.compare(t).select(
        "c_custkey", F.col(dim.column_compared).cast("long").alias("email_level")
    )


_STREETS = [
    "MAPLEWOOD HEIGHTS", "OAKBROOK TERRACE", "RIVERBEND CROSSING",
    "LAKESHORE COMMONS", "PINEHURST GARDENS",
]
_CITIES = ["SPRINGFIELD", "RIVERTOWN", "LAKESIDE", "HILLTOP"]
_STATES = ["VA", "NY", "CA", "TX", "WA"]


def q_address_match_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """featurize_address + match_level (mismo/lib/geo/_address.py:60-202)
    on synthesized pairs exercising STREET1_AND_CITY_OR_POSTAL /
    POSSIBLE_TYPO / SAME_REGION / SAME_STATE / ELSE."""
    from mismo_spark.lib.address import featurize_address, match_level

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    m = k % 6

    def pick(pool, expr):
        return F.element_at(F.array(*[F.lit(x) for x in pool]), expr.cast("int"))

    num = ((k % 89) + 1).cast("string")
    name = pick(_STREETS, k % 5 + 1)
    name_alt = pick(_STREETS, (k + 2) % 5 + 1)
    # single-char substitution keeps dl_ratio > 0.9 on these long names
    name_typo = F.concat(F.lit("X"), F.substring(name, 2, 100))
    city = pick(_CITIES, k % 4 + 1)
    city_alt = pick(_CITIES, (k + 1) % 4 + 1)
    state = pick(_STATES, k % 5 + 1)
    state_alt = pick(_STATES, (k + 1) % 5 + 1)
    postal = F.lpad(((k * 13) % 89999 + 10000).cast("string"), 5, "0")
    postal_alt = F.lpad(((k * 13) % 89999 + 10001).cast("string"), 5, "0")
    num_alt = ((k % 89) + 2).cast("string")

    s1_l = F.concat_ws(" ", num, name, F.lit("ST"))
    s1_r = (
        F.when(m == 1, s1_l)
        .when(m == 2, F.concat_ws(" ", num, name_typo, F.lit("ST")))
        .when(m == 3, F.concat_ws(" ", num_alt, name_alt, F.lit("ST")))
        .when(m == 4, F.concat_ws(" ", num_alt, name_alt, F.lit("ST")))
        .when(m == 5, F.concat_ws(" ", num_alt, name_alt, F.lit("ST")))
        .otherwise(s1_l)
    )
    city_r = F.when((m == 1) | (m == 4) | (m == 5), city_alt).otherwise(city)
    state_r = F.when(m == 5, state_alt).otherwise(state)
    postal_r = F.when((m == 2) | (m == 4) | (m == 5), postal_alt).otherwise(postal)

    def addr(s1, c, st, pc):
        return F.struct(
            s1.alias("street1"),
            F.lit(None).cast("string").alias("street2"),
            c.alias("city"),
            st.alias("state"),
            pc.alias("postal_code"),
        )

    t = cust.select(
        "c_custkey",
        featurize_address(addr(s1_l, city, state, postal)).alias("a_l"),
        featurize_address(addr(s1_r, city_r, state_r, postal_r)).alias("a_r"),
    )
    return t.select(
        "c_custkey",
        match_level(F.col("a_l"), F.col("a_r")).cast("long").alias("addr_level"),
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide embedding-cosine near-duplicate detection
    (hyperplane-LSH buckets → candidate self-join → exact cosine ≥ τ).
    The raw embeddings table has no near-dup pairs (max cosine ≈ 0.51),
    so 100 duplicates are planted deterministically: for vec_id % 5 == 0
    a copy at id+100000 with element 1 perturbed by +0.05 (cosine
    ≈ 0.9988).  The oracle replays the identical seeded hyperplanes, so
    candidate generation AND the cosine recheck are both value-checked."""
    from mismo_spark.ann import embedding_near_duplicates

    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    pert = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, 63)
    )
    dups = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), pert.alias("embedding")
    )
    allv = base.unionByName(dups)
    out = embedding_near_duplicates(
        allv,
        min_cosine=0.95,
        dim=64,
        n_bands=8,
        band_bits=8,
        seed=42,
    )
    # numpy einsum (Spark) and list_dot_product (DuckDB) sum in
    # different orders → last-ULP cosine differences; quantize for the
    # driver's raw value-hash (the 0.95 gate is far from every value:
    # planted ≈0.9988, background ≤0.51, so the ROW SET is stable)
    return out.select("id_l", "id_r", _micro("cosine", "cosine_micro"))


def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive (anchor, positive, hard-negative) mining
    (mismo_spark/ann/mining.py): positives = best-cosine duplicate
    partner from the planted-dup relation of q_embedding_near_dup;
    hard negatives = best-cosine same-hyperplane-bucket NON-duplicate.
    The oracle replays the seeded hyperplanes as SQL literals plus both
    argmaxes, so bucket candidates, anti-join and tie-breaks are all
    value-checked."""
    from mismo_spark.ann.mining import contrastive_triplets

    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    pert = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, 63)
    )
    dups = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), pert.alias("embedding")
    )
    allv = base.unionByName(dups)
    dup_rel = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("id_l"), (F.col("vec_id") + 100000).alias("id_r")
    )
    out = contrastive_triplets(
        allv, dup_rel, dim=64, n_bands=8, band_bits=8, seed=42
    )
    return out.select(
        "anchor_id",
        "positive_id",
        _micro("pos_cosine", "pos_cosine_micro"),
        "negative_id",
        _micro("neg_cosine", "neg_cosine_micro"),
    )


def _hyperplane_bucket_sql(
    *, dim: int, n_bands: int, band_bits: int, seed: int
) -> str:
    """SQL list literal of the n_bands bucket keys for a DOUBLE[] column
    ``v``: the SAME seeded hyperplanes (numpy RandomState draw order
    matches mismo_spark/ann/__init__.py hyperplane_buckets) folded in as
    list literals, sign-bit buckets packed identically."""
    import numpy as np

    rng = np.random.RandomState(seed)
    buckets = []
    for b in range(n_bands):
        bits = []
        for j in range(band_bits):
            h = rng.randn(dim)
            lit = "[" + ", ".join(repr(float(w)) for w in h) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(v, {lit}::DOUBLE[]) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        buckets.append("(" + " + ".join(bits) + f" + {b << 32})")
    return "[" + ",\n ".join(buckets) + "]"


def _embedding_near_dup_oracle_sql(
    *, dim: int = 64, n_bands: int = 8, band_bits: int = 8, seed: int = 42
) -> str:
    """DuckDB replay of q_embedding_near_dup: seeded-hyperplane buckets
    (see _hyperplane_bucket_sql), bucket self-join, then the
    exact-cosine recheck with the same dot/√·√ formula."""
    bucket_arr = _hyperplane_bucket_sql(
        dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
    )
    return f"""
        WITH b AS (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        allv AS (
          SELECT * FROM b
          UNION ALL
          SELECT id + 100000, [v[1] + 0.05] || v[2:] FROM b WHERE id % 5 = 0
        ),
        keyed AS (
          SELECT id, v, unnest({bucket_arr}) AS bucket FROM allv
        ),
        cand AS (
          SELECT DISTINCT l.id AS id_l, r.id AS id_r
          FROM keyed l JOIN keyed r ON l.bucket = r.bucket AND l.id < r.id
        ),
        scored AS (
          SELECT id_l, id_r,
                 list_dot_product(a.v, c.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(c.v, c.v))) AS cosine
          FROM cand
          JOIN allv a ON a.id = cand.id_l
          JOIN allv c ON c.id = cand.id_r
        )
        SELECT id_l, id_r,
               CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_micro
        FROM scored WHERE cosine >= 0.95
    """


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate cosine top-k
    (mismo_spark/ann/lsh_cosine_topk: corpus explodes to (id, bucket)
    rows, queries broadcast with their vectors, exact cosine_pairs
    re-rank within shared-bucket candidates).  Queries are perturbed
    copies of every 25th corpus vector (+0.05 on element 1, id+200000)
    so each query has a strong planted neighbour; the oracle replays
    the identical seeded hyperplanes as SQL literals, so candidate
    generation AND the re-rank are both value-checked."""
    from mismo_spark.ann import lsh_cosine_topk

    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    corpus = emb.select("vec_id", v.alias("embedding"))
    pert = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, 63)
    )
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"), pert.alias("embedding")
    )
    out = lsh_cosine_topk(
        corpus, queries, k=5, dim=64, n_bands=16, band_bits=8, seed=42
    )
    return out.select(
        "query_id", "neighbour_id", _micro("cosine", "cosine_micro")
    )


def _multi_ngram_oracle_sql(*, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)) -> str:
    """DuckDB replay of q_multi_ngram_repetition: a lateral unnest over
    the n list generates every (doc, n, gram) occurrence, then the same
    count → rank → conditional-pivot rollup as the Spark plan."""
    all_ns = sorted(set(list(top_ns) + list(dup_ns)))
    ns_lit = "[" + ", ".join(str(n) for n in all_ns) + "]"
    top_pv = ",\n                ".join(
        f"max(CASE WHEN n = {n} AND text_len > 0 THEN"
        f" round(top_chars / text_len::DOUBLE, 9) END) AS t{n}"
        for n in top_ns
    )
    dup_pv = ",\n                ".join(
        f"max(CASE WHEN n = {n} AND text_len > 0 THEN"
        f" round(least(dup_chars / text_len::DOUBLE, 1.0), 9) END) AS u{n}"
        for n in dup_ns
    )
    out = ",\n              ".join(
        [f"coalesce(t{n}, 0.0) AS top_{n}gram_char_frac" for n in top_ns]
        + [f"coalesce(u{n}, 0.0) AS dup_{n}gram_char_frac" for n in dup_ns]
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id,
            string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS t
          FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        base AS (
          SELECT doc_id, length(array_to_string(t, ' ')) AS text_len, t
          FROM toks
        ),
        grams AS (
          SELECT doc_id, text_len, n, array_to_string(t[i:i + n - 1], ' ') AS g
          FROM base,
               unnest({ns_lit}) AS ns(n),
               unnest(range(1, len(t) - n + 2)) AS u(i)
        ),
        counts AS (
          SELECT doc_id, text_len, n, g, count(*) AS c
          FROM grams GROUP BY ALL
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id, n ORDER BY c DESC, g ASC
          ) AS rk FROM counts
        ),
        per_doc AS (
          SELECT doc_id, text_len, n,
            max(CASE WHEN rk = 1 THEN c * length(g) END) AS top_chars,
            sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_chars
          FROM ranked GROUP BY ALL
        ),
        pv AS (
          SELECT doc_id,
                {top_pv},
                {dup_pv}
          FROM per_doc GROUP BY doc_id
        )
        SELECT d.doc_id,
              {out}
        FROM documents d LEFT JOIN pv ON d.doc_id = pv.doc_id
    """


def _contrastive_oracle_sql(
    *, dim: int = 64, n_bands: int = 8, band_bits: int = 8, seed: int = 42
) -> str:
    """DuckDB replay of q_contrastive_triplets: planted-dup relation,
    cosine argmax for positives, hyperplane-literal buckets + NOT
    EXISTS anti-join + cosine argmax for hard negatives.  Ties break
    (cosine DESC, partner id ASC) — the same total order as the Spark
    side's min(struct(-cosine, id))."""
    bucket_arr = _hyperplane_bucket_sql(
        dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
    )
    cos = (
        "list_dot_product(a.v, p.v) / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(p.v, p.v)))"
    )
    return f"""
        WITH b AS (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        allv AS (
          SELECT * FROM b
          UNION ALL
          SELECT id + 100000, [v[1] + 0.05] || v[2:] FROM b WHERE id % 5 = 0
        ),
        dup AS (SELECT id AS id_l, id + 100000 AS id_r FROM b WHERE id % 5 = 0),
        sym AS (
          SELECT id_l AS anchor_id, id_r AS partner_id FROM dup
          UNION ALL
          SELECT id_r, id_l FROM dup
        ),
        pos_scored AS (
          SELECT anchor_id, partner_id, {cos} AS cosine
          FROM sym
          JOIN allv a ON a.id = sym.anchor_id
          JOIN allv p ON p.id = sym.partner_id
        ),
        pos AS (
          SELECT anchor_id, partner_id AS positive_id, cosine AS pos_cosine
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY anchor_id ORDER BY cosine DESC, partner_id ASC
                ) AS rn FROM pos_scored)
          WHERE rn = 1
        ),
        keyed AS (
          SELECT id, unnest({bucket_arr}) AS bucket FROM allv
        ),
        cand AS (
          SELECT DISTINCT l.id AS anchor_id, r.id AS partner_id
          FROM keyed l JOIN keyed r ON l.bucket = r.bucket AND l.id <> r.id
        ),
        nondup AS (
          SELECT c.* FROM cand c
          WHERE NOT EXISTS (
            SELECT 1 FROM sym s
            WHERE s.anchor_id = c.anchor_id AND s.partner_id = c.partner_id
          )
        ),
        neg_scored AS (
          SELECT anchor_id, partner_id, {cos} AS cosine
          FROM nondup
          JOIN allv a ON a.id = nondup.anchor_id
          JOIN allv p ON p.id = nondup.partner_id
        ),
        neg AS (
          SELECT anchor_id, partner_id AS negative_id, cosine AS neg_cosine
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY anchor_id ORDER BY cosine DESC, partner_id ASC
                ) AS rn FROM neg_scored)
          WHERE rn = 1
        )
        SELECT anchor_id, positive_id,
               CAST(floor(pos_cosine * 1000000 + 0.5) AS BIGINT)
                 AS pos_cosine_micro,
               negative_id,
               CAST(floor(neg_cosine * 1000000 + 0.5) AS BIGINT)
                 AS neg_cosine_micro
        FROM pos JOIN neg USING (anchor_id)
    """


def _lsh_topk_oracle_sql(
    *, dim: int = 64, n_bands: int = 16, band_bits: int = 8, seed: int = 42
) -> str:
    """DuckDB replay of q_lsh_topk: same seeded hyperplane buckets on
    both sides, bucket equi-join, distinct (query, neighbour) pairs,
    exact cosine, per-query top-5 window."""
    bucket_arr = _hyperplane_bucket_sql(
        dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
    )
    return f"""
        WITH c AS (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        q AS (
          SELECT id + 200000 AS id, [v[1] + 0.05] || v[2:] AS v
          FROM c WHERE id % 25 = 0
        ),
        ck AS (SELECT id, v, unnest({bucket_arr}) AS bucket FROM c),
        qk AS (SELECT id, v, unnest({bucket_arr}) AS bucket FROM q),
        cand AS (
          SELECT DISTINCT qk.id AS query_id, ck.id AS neighbour_id
          FROM ck JOIN qk ON ck.bucket = qk.bucket AND ck.id <> qk.id
        ),
        scored AS (
          SELECT query_id, neighbour_id,
                 list_dot_product(qv.v, cv.v)
                   / (sqrt(list_dot_product(qv.v, qv.v))
                      * sqrt(list_dot_product(cv.v, cv.v))) AS cosine
          FROM cand
          JOIN q qv ON qv.id = cand.query_id
          JOIN c cv ON cv.id = cand.neighbour_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbour_id ASC
          ) AS rn
          FROM scored
        )
        SELECT query_id, neighbour_id,
               CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_micro
        FROM ranked WHERE rn <= 5
    """


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over planted near-dups: 4
    seed-centroid cells (the 4 lowest-id vectors — zero Lloyd
    iterations, so the oracle re-derives the centroids from the table
    itself), within-cell exact-cosine pairs ≥ 0.95, connected dup
    groups, and the paper's low-centroid-sim keep rule.  Duplicates are
    planted as in q_embedding_near_dup (vec_id % 5 == 0 → a copy at
    id+100000 with element 1 perturbed by +0.05, cosine ≈ 0.9988).
    mismo_spark/ann/semdedup.py — assignment, pairing, CC and the keep
    window are ALL value-checked by the recursive-CTE oracle."""
    from mismo_spark.ann.semdedup import seed_centroids, semdedup

    emb = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    pert = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, 63)
    )
    dups = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), pert.alias("embedding")
    )
    allv = base.unionByName(dups)
    cents = seed_centroids(allv, 4)
    out = semdedup(allv, cents, min_cosine=0.95)
    return out.select(
        "vec_id",
        "cell",
        _micro("cent_cos", "cent_cos_micro"),
        "component",
        "keep",
    )


_SEMDEDUP_ORACLE_SQL = """
    WITH RECURSIVE
    b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    allv AS (
      SELECT * FROM b
      UNION ALL
      SELECT id + 100000, [v[1] + 0.05] || v[2:] FROM b WHERE id % 5 = 0
    ),
    cents AS (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS c
      FROM (SELECT * FROM allv ORDER BY id LIMIT 4)
    ),
    sim AS (
      SELECT a.id, cents.cell,
             list_dot_product(a.v, cents.c)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(cents.c, cents.c))) AS cc
      FROM allv a CROSS JOIN cents
    ),
    assign AS (
      SELECT id, cell, cc AS cent_cos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY id ORDER BY cc DESC, cell ASC
        ) AS rn FROM sim
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT l.id AS pl, r.id AS pr
      FROM assign l JOIN assign r ON l.cell = r.cell AND l.id < r.id
      JOIN allv a ON a.id = l.id
      JOIN allv c ON c.id = r.id
      WHERE list_dot_product(a.v, c.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(c.v, c.v))) >= 0.95
    ),
    e AS (SELECT pl AS u, pr AS w FROM pairs
          UNION SELECT pr, pl FROM pairs),
    reach(u, w) AS (
      SELECT u, w FROM e
      UNION
      SELECT r.u, e.w FROM reach r JOIN e ON r.w = e.u
    ),
    comp AS (
      SELECT a.id, least(a.id, coalesce(m.mn, a.id)) AS component
      FROM assign a LEFT JOIN (
        SELECT u, min(w) AS mn FROM reach GROUP BY u
      ) m ON m.u = a.id
    ),
    ranked AS (
      SELECT a.id, a.cell, a.cent_cos, comp.component,
             row_number() OVER (
               PARTITION BY comp.component
               ORDER BY a.cent_cos ASC, a.id ASC
             ) AS rn
      FROM assign a JOIN comp ON comp.id = a.id
    )
    SELECT id AS vec_id, cell::INT AS cell,
           CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS cent_cos_micro,
           component, (rn = 1) AS keep
    FROM ranked
"""


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): pick the 50 documents
    whose hashed-n-gram distribution (unigrams + bigrams, md5-hashed
    into 1000 buckets) best matches the English subset, via importance
    log-weights against add-1-smoothed bucket LMs and deterministic
    Gumbel top-k resampling.  mismo_spark/textqa/dsir.py — feature
    hashing, both LMs, the weights AND the sampled set replay
    bit-for-bit in the DuckDB oracle (md5 arithmetic only, no
    rand())."""
    from mismo_spark.textqa.dsir import dsir_select

    docs = _docs(spark, sf_dir)
    out = dsir_select(
        docs,
        docs.filter(F.col("lang") == "en"),
        k=50,
        n_buckets=1000,
        seed=0,
        gumbel_seed=42,
    )
    return out.select(
        "doc_id",
        "n_grams",
        _micro("log_weight", "log_weight_micro"),
        _micro("key", "key_micro"),
    )


_DSIR_ORACLE_SQL = r"""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    grams AS (
      SELECT doc_id, lang, unnest(
        list_transform(
          t, x -> ('0x' || substr(md5(x || ':0'), 1, 8))::BIGINT % 1000
        ) ||
        list_filter(
          list_transform(t, (x, i) -> CASE WHEN i < len(t) THEN
            ('0x' || substr(md5(x || ' ' || t[i + 1] || ':0'),
                            1, 8))::BIGINT % 1000 END),
          b -> b IS NOT NULL
        )
      ) AS bucket
      FROM toks
    ),
    t_counts AS (
      SELECT bucket, count(*) AS n FROM grams WHERE lang = 'en' GROUP BY 1
    ),
    r_counts AS (SELECT bucket, count(*) AS n FROM grams GROUP BY 1),
    t_tot AS (SELECT coalesce(sum(n), 0) AS total FROM t_counts),
    r_tot AS (SELECT coalesce(sum(n), 0) AS total FROM r_counts),
    score AS (
      SELECT g.doc_id,
             ln((coalesce(tc.n, 0) + 1.0) / (t_tot.total + 1000.0))
               - ln((coalesce(rc.n, 0) + 1.0) / (r_tot.total + 1000.0))
               AS lw
      FROM grams g
      LEFT JOIN t_counts tc USING (bucket)
      LEFT JOIN r_counts rc USING (bucket)
      CROSS JOIN t_tot CROSS JOIN r_tot
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_grams, sum(lw) AS lwsum
      FROM score GROUP BY 1
    ),
    keyed AS (
      SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
             coalesce(p.lwsum, 0.0) AS lw,
             coalesce(p.lwsum, 0.0) + -ln(-ln(
               (('0x' || substr(md5(d.doc_id::VARCHAR || '|42'),
                               1, 8))::BIGINT + 1) / 4294967297.0
             )) AS key
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT doc_id, n_grams::BIGINT AS n_grams,
           CAST(floor(lw * 1000000 + 0.5) AS BIGINT) AS log_weight_micro,
           CAST(floor(key * 1000000 + 0.5) AS BIGINT) AS key_micro
    FROM keyed ORDER BY key DESC, doc_id LIMIT 50
"""


def q_crawl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed crawl stats (mismo has no streaming; this is
    the engine's watermarked windowed-agg operator run in batch mode,
    where the watermark is a no-op and exact distinct is allowed).
    Pages synthesized from orders: deterministic url/domain, warc_ts =
    o_orderdate, text = o_orderpriority."""
    from mismo_spark.streaming.monitor import crawl_stats_stream

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pages = orders.select(
        F.concat(
            F.lit("http://d"),
            (F.col("o_custkey") % 50).cast("string"),
            F.lit(".com/"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.col("o_orderdate").alias("warc_ts"),
        F.col("o_orderpriority").alias("text"),
    )
    out = crawl_stats_stream(
        pages, window="1 day", watermark="1 hour", exact=True
    )
    return out.select(
        F.col("window.start").cast("date").alias("day"),
        "domain",
        "n_pages",
        F.col("approx_distinct_texts").alias("distinct_texts"),
        _micro("dup_rate", "dup_rate_micro"),
    )


def q_unnest_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnnestLinker: block where ANY array element matches
    (mismo/linker/_unnest.py:12-99).  Tokens ≥ 7 chars keep keys rare —
    the idf-style filtering token blocking wants at scale."""
    from mismo_spark.linker.unnest import UnnestLinker
    from mismo_spark.text.features import tokenize

    docs = _docs(spark, sf_dir).select(
        "record_id",
        F.filter(
            F.array_distinct(tokenize(F.lower(F.col("text")))),
            lambda t: F.length(t) >= 7,
        ).alias("tokens"),
    )
    return UnnestLinker("tokens", task="dedupe")(docs).links


def q_join_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JoinLinker: arbitrary condition incl. a non-equi band, with the
    slow-join plan guard active (mismo/linker/_join_linker.py:13-68 +
    mismo/joins/_analyze.py:13-153).  Equi on o_custkey keeps Catalyst
    on a hash join; the price band is a post-join filter."""
    from mismo_spark.linker.join import JoinLinker

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("record_id"), "o_custkey", "o_totalprice"
    )

    def cond(l: DataFrame, r: DataFrame):
        return (l["o_custkey"] == r["o_custkey"]) & (
            F.abs(l["o_totalprice"] - r["o_totalprice"]) < 1000
        )

    return JoinLinker(cond, task="dedupe")(orders).links


def q_id_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDLinker: shared-identifier linkage, nulls never match
    (mismo/linker/_id_linker.py:13-127).  Synthetic id: doc_id % 97,
    null for one source to exercise the null policy."""
    from mismo_spark.linker.id import IDLinker

    docs = _docs(spark, sf_dir).withColumn(
        "ssn",
        F.when(F.col("source") != "web", F.col("doc_id") % 97),
    )
    return IDLinker("ssn", task="dedupe")(docs).links


def q_id_linker_indefinite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDLinker three-way split, indefinite pairs materialized
    (mismo/linker/_id_linker.py:116-118 — NIE in the reference;
    implemented here as the union of the policies' don't-know
    branches).  Both policies indefinite so the union path is
    exercised; docs capped at doc_id < 150 because the indefinite set
    is O(n²) by definition (bounded-by-contract, like FullLinker)."""
    from mismo_spark.linker.id import IDLinker

    docs = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 150)
        .withColumn(
            "ssn",
            F.when(F.col("source") != "web", F.col("doc_id") % 97),
        )
    )
    lk = IDLinker(
        "ssn", when_null="indefinite", when_not_equal="indefinite", task="dedupe"
    )
    return lk.indefinite_linkage(docs).links


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram-set Jaccard near-dup with a blocking key
    (mismo-adjacent; SURVEY §2.13 n-gram Jaccard dedup)."""
    from mismo_spark.dedupe import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    out = ngram_jaccard_pairs(
        docs, "text", n=3, blocking_key="source", min_jaccard=0.35
    )
    return _micro_wrap(
        out, [c for c in out.columns if c != "jaccard_sim"], ["jaccard_sim"]
    )


def q_re_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-group regex → struct extraction
    (mismo/text/_re_extract.py:14-72), flattened for comparison."""
    from mismo_spark.text.re_extract import re_extract_struct

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ex = re_extract_struct(
        F.col("o_orderpriority"), r"(?P<rank>\d+)-(?P<label>[A-Z ]+)"
    )
    return orders.select(
        "o_orderkey", ex.alias("__ex")
    ).select(
        "o_orderkey",
        F.col("__ex.rank").alias("rank"),
        F.col("__ex.label").alias("label"),
    )


def q_name_blocker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NameBlocker: 6×6 cross of name-part equi-joins, catches swapped
    given↔surname (mismo/lib/name/_blocker.py:12-104).  Names are made
    rare with a per-customer numeric suffix so no key explodes; ~1 in 7
    right-side names swaps given/surname."""
    from mismo_spark.lib.name_blocker import NameBlocker

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    giv = F.concat(
        F.element_at(F.array(*[F.lit(g) for g in _GIVENS]), (k % 9 + 1).cast("int")),
        (k % 53).cast("string"),
    )
    sur = F.concat(
        F.element_at(F.array(*[F.lit(s) for s in _SURNAMES]), (k % 7 + 1).cast("int")),
        ((k + 3) % 53).cast("string"),
    )
    swapped = (k % 7) == 0
    empty = F.lit("")
    name = F.struct(
        empty.alias("prefix"),
        F.when(swapped, sur).otherwise(giv).alias("given"),
        empty.alias("middle"),
        F.when(swapped, giv).otherwise(sur).alias("surname"),
        empty.alias("suffix"),
        empty.alias("nickname"),
    )
    recs = cust.select(F.col("c_custkey").alias("record_id"), name.alias("name"))
    return NameBlocker(column="name", max_pairs=None, task="dedupe")(recs).links


def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM-style): per-document word
    n-gram overlap with an eval set — here a deterministic slice of the
    documents table (doc_id % 97 == 0) stands in for the benchmark.
    n=3 instead of the production 13 so the short synthetic docs
    produce nonzero overlap.  The benchmark n-gram hashes are
    broadcast; the one shuffle is the per-doc count."""
    from mismo_spark.textqa.contamination import ngram_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    out = ngram_contamination(docs, bench, n=3, id_col="record_id")
    return _micro_wrap(
        out,
        ["record_id", "n_ngrams", "n_contaminated"],
        ["contamination_frac"],
    )


def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate signal: fraction of each doc's distinct 3-grams that
    occur in ≥2 documents (explode → df-count → join-back → per-doc
    aggregate, all on 8-byte n-gram hashes)."""
    from mismo_spark.textqa.contamination import duplicated_ngram_fraction

    out = duplicated_ngram_fraction(
        _docs(spark, sf_dir), n=3, min_df=2, id_col="record_id"
    )
    return _micro_wrap(
        out, ["record_id", "n_ngrams", "n_duplicated"], ["duplicated_frac"]
    )


def q_multi_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher A1.1 repetition battery (textqa/repetition.py
    multi_ngram_repetition_signals): top-{2,3,4}-gram and
    duplicated-{5..10}-gram char fractions, every n from ONE tokenize +
    ONE generate + ONE (id, n, gram) groupBy — not |ns| corpus passes."""
    from mismo_spark.textqa.repetition import multi_ngram_repetition_signals

    out = multi_ngram_repetition_signals(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        top_ns=(2, 3, 4),
        dup_ns=(5, 6, 7, 8, 9, 10),
        id_col="doc_id",
    )
    return _micro_wrap(
        out,
        ["doc_id"],
        [f"top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n}gram_char_frac" for n in (5, 6, 7, 8, 9, 10)],
    )


def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail tiering (no reference counterpart;
    textqa/buckets.py): per-language QUARTILE buckets of n_chars.  Cut
    points come from one exact-percentile aggregation per language and
    are broadcast-joined back — never a per-language window sort (the
    mega-partition trap: one language can be half the corpus)."""
    from mismo_spark.textqa.buckets import quality_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    out = quality_buckets(docs, "n_chars", by=["lang"], cuts=(0.25, 0.5, 0.75))
    return out.select(
        "doc_id", "lang", "n_chars", F.col("bucket").cast("int").alias("bucket")
    )


def _citation_edges(spark: SparkSession, sf_dir: str):
    """Deterministic pseudo-random citation graph over the documents
    table: every doc d (except d % 10 == 0, which become dangling /
    absent sources) links to (d*17+7) % n and (d*31+3) % n.  Pure
    column arithmetic, so the DuckDB oracle replays it exactly."""
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    base = docs.filter(F.col("doc_id") % 10 != 0)
    e1 = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 17 + 7) % n).alias("dst"),
    )
    e2 = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 31 + 3) % n).alias("dst"),
    )
    return e1.unionByName(e2), n


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-conserving PageRank (mismo_spark/graph.py) over the
    deterministic citation graph: 6 iterations, damping 0.85, dangling
    mass redistributed in-plan (no driver collect per round).  Ranks
    quantized to integer micro-units on BOTH sides (see _micro)."""
    from mismo_spark.graph import pagerank

    edges, _ = _citation_edges(spark, sf_dir)
    ranks = pagerank(edges, n_iter=6, damping=0.85)
    return ranks.select("node", _micro("rank", "rank_micro"))


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank / TrustRank (Gyöngyi et al. VLDB 2004)
    over the citation graph: teleport restricted to seed docs
    (doc_id % 97 == 1) with weights 1 + doc_id % 3 — rank flows
    outward from the trusted seeds, demoting link clusters unreachable
    from them.  Same in-plan dangling handling as q_pagerank."""
    from mismo_spark.graph import pagerank

    edges, _ = _citation_edges(spark, sf_dir)
    seeds = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") % 97 == 1)
        .select(
            F.col("doc_id").alias("node"),
            (F.lit(1.0) + (F.col("doc_id") % 3).cast("double")).alias("weight"),
        )
    )
    ranks = pagerank(edges, n_iter=6, damping=0.85, teleport=seeds)
    return ranks.select("node", _micro("rank", "rank_micro"))


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank over the contracted host graph — the scale
    move for ranking at 10^12 pages (the host graph is ~10^7 nodes).
    Here 'host' is the documents.source label: the citation edges are
    joined to both endpoints' sources, self-loops dropped, link counts
    become edge weights, and pagerank runs with
    weight_column='weight' (neighbour gets rank·w/out_strength)."""
    from mismo_spark.graph import pagerank

    edges, _ = _citation_edges(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    s = docs.select(F.col("doc_id").alias("src"), F.col("source").alias("src_host"))
    t = docs.select(F.col("doc_id").alias("dst"), F.col("source").alias("dst_host"))
    host_edges = (
        edges.join(s, "src")
        .join(t, "dst")
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    ranks = pagerank(
        host_edges,
        n_iter=6,
        damping=0.85,
        src_column="src_host",
        dst_column="dst_host",
        weight_column="weight",
    )
    return ranks.select("node", _micro("rank", "rank_micro"))


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (mismo_spark/graph.py, Kleinberg 1999)
    over the citation graph: 6 rounds of L1-normalized
    authority←Σhub / hub←Σauthority sweeps, normalizers broadcast
    in-plan.  Scores quantized to integer micro-units on both sides
    (see _micro)."""
    from mismo_spark.graph import hits

    edges, _ = _citation_edges(spark, sf_dir)
    out = hits(edges, n_iter=6)
    return out.select(
        "node",
        _micro("hub", "hub_micro"),
        _micro("authority", "authority_micro"),
    )


def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source link reciprocity (mismo_spark/graph.py reciprocity)
    over the citation graph — the link-farm spam feature: fraction of
    a node's distinct out-edges whose reverse edge exists."""
    from mismo_spark.graph import reciprocity

    edges, _ = _citation_edges(spark, sf_dir)
    out = reciprocity(edges)
    return out.select(
        "node",
        "n_out",
        "n_reciprocal",
        F.expr("div(1000000 * n_reciprocal, n_out)")
        .cast("long")
        .alias("reciprocity_micro"),
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar / common-neighbor link prediction
    (mismo_spark/graph.py link_prediction) over the citation graph —
    the missed-merge queue: non-adjacent doc pairs sharing neighbors,
    scored by Σ 1/ln(deg(shared)).  AA sums have ≤ a handful of terms
    here so micro-quantization is ULP-safe."""
    from mismo_spark.graph import link_prediction

    edges, _ = _citation_edges(spark, sf_dir)
    out = link_prediction(edges, max_degree=1000, min_common=2)
    return out.select(
        F.col("node_a").cast("long").alias("node_a"),
        F.col("node_b").cast("long").alias("node_b"),
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        _micro("adamic_adar", "adamic_adar_micro"),
        _micro("jaccard", "jaccard_micro"),
    )


def q_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edge_support (mismo_spark/graph.py): per-edge triangle count
    over the citation graph — the weak-bridge detector: transitive
    closure welds entities through single links, and a cross-entity
    bridge is almost always support-0 while intra-entity links sit in
    triangle neighborhoods."""
    from mismo_spark.graph import edge_support

    edges, _ = _citation_edges(spark, sf_dir)
    out = edge_support(edges, max_degree=1000)
    return out.select(
        F.col("node_a").cast("long").alias("node_a"),
        F.col("node_b").cast("long").alias("node_b"),
        F.col("support").cast("long").alias("support"),
    )


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """local_clustering (mismo_spark/graph.py): per-node triangle count
    and Watts-Strogatz clustering coefficient over the citation graph —
    near-zero clustering flags hub records stitched onto unrelated
    records (shared default values)."""
    from mismo_spark.graph import local_clustering

    edges, _ = _citation_edges(spark, sf_dir)
    out = local_clustering(edges, max_degree=1000)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("degree").cast("long").alias("degree"),
        F.col("triangles").cast("long").alias("triangles"),
        _micro("clustering", "clustering_micro"),
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007,
    mismo_spark/graph.py) over the citation graph, 4 sweeps — the
    dense-core splitter for transitively over-merged components.
    Integer-only arithmetic, so the oracle replay is engine-exact."""
    from mismo_spark.graph import label_propagation

    edges, _ = _citation_edges(spark, sf_dir)
    out = label_propagation(edges, n_iter=4)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_anchors + top_anchor_texts (mismo_spark/graph.py) over
    synthetic pages whose anchors carry the linking doc's source label
    ('srcN link' plain, 'srcN' inside <b> tags, the second behind a
    #fragment) — the oracle computes the expected profile directly
    from the generating columns, so the whole regex→explode→top-k
    path is value-checked against ground truth."""
    from mismo_spark.graph import extract_anchors, top_anchor_texts

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    n = docs.count()
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<html><a href="doc://'),
            ((F.col("doc_id") * 17 + 7) % n).cast("string"),
            F.lit('" class="nav">'),
            F.col("source"),
            F.lit(' link</a>\n<a href="doc://'),
            ((F.col("doc_id") * 31 + 3) % n).cast("string"),
            F.lit('#frag"><b>'),
            F.col("source"),
            F.lit("</b></a></html>"),
        ).alias("html"),
    )
    out = top_anchor_texts(extract_anchors(pages), k=2)
    return out.select(
        "outlink",
        "anchor",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_link_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_outlinks + degrees (mismo_spark/graph.py) over synthetic
    HTML pages built from the citation-graph targets: one href without
    and one WITH a #fragment (exercising the fragment-strip), node ids
    as doc:// URLs.  Map-only regexp extraction, two map-side-combined
    groupBys, one full-outer join."""
    from mismo_spark.graph import degrees, extract_outlinks

    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<html><a href="doc://'),
            ((F.col("doc_id") * 17 + 7) % n).cast("string"),
            F.lit('">a</a><a href="doc://'),
            ((F.col("doc_id") * 31 + 3) % n).cast("string"),
            F.lit('#frag">b</a></html>'),
        ).alias("html"),
    )
    edges = extract_outlinks(pages).select(
        F.col("url").alias("src"), F.col("outlink").alias("dst")
    )
    d = degrees(edges)
    return d.select(
        "node",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("in_degree").cast("long").alias("in_degree"),
    )


# deterministic near-dup twin of each document: overwrite ~one phash
# grid cell of characters with '~' in the middle of the text — integer
# char arithmetic (div) so Spark and DuckDB build byte-identical twins
_PHASH_TWIN_EXPR = (
    "concat(substr(text, 1, (length(text) div 2) - 1), "
    "repeat('~', (length(text) + 71) div 72), "
    "substr(text, (length(text) div 2) + (length(text) + 71) div 72))"
)


def q_phash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phash64 (multimodal/__init__.py): 64-bit grid-dHash per binary
    payload — the codec-free perceptual hash (72-cell byte-grid means,
    integer cross-multiplied dHash comparisons, mapInPandas numpy
    kernel).  Payload here is the utf-8 bytes of ``text`` standing in
    for an opaque media column; docs under 72 bytes hash NULL and are
    excluded.  The oracle recomputes every hash from hex(encode(text))
    in pure SQL, so a green row pins the whole kernel bit-for-bit."""
    from mismo_spark.multimodal import phash64

    docs = _docs(spark, sf_dir).select(
        "record_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return phash64(docs).filter(F.col("ph").isNotNull()).select("record_id", "ph")


def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phash_near_duplicates (multimodal/__init__.py): Hamming-banded
    perceptual-hash near-dup — grid-dHash signatures + the SimHash
    family's block-permutation blocking (dedupe.hamming_banded_pairs,
    complete at max_hamming by pigeonhole).  Each document gets a
    deterministic near-dup twin (one grid cell of chars overwritten,
    id + 1,000,000); the operator must recover the planted twins within
    3 bits — at sf0.01 that is 483 of 500 pairs, zero false pairs —
    while the oracle brute-forces all hashes in SQL."""
    from mismo_spark.multimodal import phash_near_duplicates

    docs = _docs(spark, sf_dir).select("record_id", "text")
    twins = docs.select(
        (F.col("record_id") + F.lit(1000000)).alias("record_id"),
        F.expr(_PHASH_TWIN_EXPR).alias("text"),
    )
    both = docs.unionByName(twins).select(
        "record_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return phash_near_duplicates(both, max_hamming=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-checked query registry.

    ORDER MATTERS: the driver's correctness harness verifies only the
    first ~50 dict entries per round, so entries are ordered by
    verification need, not topic:

    1. The 47 queries that had no driver-green row after rounds 1-4
       (each round's harness capped at the first 50 entries; these are
       the final never-checked tail) - a green round here makes
       cumulative driver coverage 150/150.
    2. Three re-checks: local_clustering (its capped-hub NULL-triangle
       semantics changed this round) plus the two flagship rows
       (fs_score, connected_components) as canaries on unchanged code.
    3. The 100 rows already driver-green in CORRECTNESS_r01-r04
       (unchanged code - those artifacts stand as their evidence).
    """
    return {
        # -- 1. never driver-verified in r1-r4: the final rotation ------
        "quantize_embeddings": q_quantize_embeddings,
        "one_to_one_match": q_one_to_one_match,
        "canopy_assign": q_canopy_assign,
        "core_numbers": q_core_numbers,
        "pivot_clustering": q_pivot_clustering,
        "clk_dice_pairs": q_clk_dice_pairs,
        "center_clustering": q_center_clustering,
        "mutual_best": q_mutual_best,
        "band_linker": q_band_linker,
        "c4_clean": q_c4_clean,
        "redact_pii": q_redact_pii,
        "stratified_sample": q_stratified_sample,
        "line_repetition": q_line_repetition,
        "paragraph_repetition": q_paragraph_repetition,
        "ngram_repetition": q_ngram_repetition,
        "name_blocker": q_name_blocker,
        "ngram_contamination": q_ngram_contamination,
        "dup_ngram_fraction": q_dup_ngram_fraction,
        "quality_buckets": q_quality_buckets,
        "contrastive_triplets": q_contrastive_triplets,
        "ngram_jaccard": q_ngram_jaccard,
        "monge_elkan": q_monge_elkan,
        "soft_tfidf": q_soft_tfidf,
        "containment": q_containment,
        "tversky": q_tversky,
        "bloom_prefilter": q_bloom_prefilter,
        "line_langs": q_line_langs,
        "best_match_filter": q_best_match_filter,
        "strings_norm": q_strings_norm,
        "keep_latest": q_keep_latest,
        "histogram": q_histogram,
        "profile_numeric": q_profile_numeric,
        "re_extract": q_re_extract,
        "unnest_linker": q_unnest_linker,
        "join_linker": q_join_linker,
        "id_linker": q_id_linker,
        "level_proportions": q_level_proportions,
        "train_labels": q_train_labels,
        "bcubed": q_bcubed,
        "full_linker": q_full_linker,
        "empty_linker": q_empty_linker,
        "train_em": q_train_em,
        "ivf_topk": q_ivf_topk,
        "pairwise_eval": q_pairwise_eval,
        "entropy_eval": q_entropy_eval,
        "rand_mi": q_rand_mi,
        "diff_stats": q_diff_stats,
        # -- 2. new this round (perceptual-hash multimodal family) ---------
        "phash_docs": q_phash_docs,
        "phash_pairs": q_phash_pairs,
        # -- 2b. re-check: capped-hub semantics changed this round ---------
        "local_clustering": q_local_clustering,
        "fs_score": q_fs_score,
        "connected_components": q_connected_components,
        # -- 3. driver-green in CORRECTNESS_r01-r04 (unchanged code) -------
        "bm25_topk": q_bm25_topk,
        "meta_blocking_graph": q_meta_blocking_graph,
        "meta_blocking_cnp": q_meta_blocking_cnp,
        "unlinkables": q_unlinkables,
        "calibration_curve": q_calibration_curve,
        "pr_curve": q_pr_curve,
        "blocking_metrics": q_blocking_metrics,
        "blocking_schemes": q_blocking_schemes,
        "id_linker_indefinite": q_id_linker_indefinite,
        "semdedup": q_semdedup,
        "dsir_select": q_dsir_select,
        "pagerank": q_pagerank,
        "trustrank": q_trustrank,
        "host_rank": q_host_rank,
        "hits": q_hits,
        "link_degrees": q_link_degrees,
        "anchor_texts": q_anchor_texts,
        "link_reciprocity": q_link_reciprocity,
        "link_prediction": q_link_prediction,
        "edge_support": q_edge_support,
        "label_propagation": q_label_propagation,
        "time_window_link": q_time_window_link,
        "blocking_rule_stats": q_blocking_rule_stats,
        "blocking_rule_greedy": q_blocking_rule_greedy,
        "edit_distance_pairs": q_edit_distance,
        "edit_distance_link": q_edit_distance_link,
        "golden_record": q_golden_record,
        "multi_ngram_repetition": q_multi_ngram_repetition,
        "temperature_sample": q_temperature_sample,
        "cluster_splits": q_cluster_splits,
        "split_leakage": q_split_leakage,
        "chunk_documents": q_chunk_documents,
        "pack_sequences": q_pack_sequences,
        "perplexity": q_perplexity,
        "bigram_perplexity": q_bigram_perplexity,
        "winnow_pairs": q_winnow_pairs,
        "name_match_level": q_name_match_level,
        "email_match_level": q_email_match_level,
        "address_match_level": q_address_match_level,
        "date_match_level": q_date_match_level,
        "embedding_near_dup": q_embedding_near_dup,
        "lsh_topk": q_lsh_topk,
        "missed_merges": q_missed_merges,
        "cluster_thresholds": q_cluster_thresholds,
        "dup_lines": q_dup_lines,
        "line_dedupe": q_line_dedupe,
        "domain_quota": q_domain_quota,
        "token_budget": q_token_budget,
        "gopher_rules": q_gopher_rules,
        "haversine": q_haversine,
        "emails_dimension": q_emails_dimension,
        "crawl_stats": q_crawl_stats,
        "diff_updates": q_diff_updates,
        "updates_apply": q_updates_apply,
        "tf_frequency": q_tf_frequency,
        "key_counts": q_key_counts,
        "pair_counts_dedupe": q_pair_counts_dedupe,
        "key_linker_block": q_key_linker_block,
        "key_linker_skew": q_key_linker_skew,
        "sorted_neighborhood": q_sorted_neighborhood,
        "or_linker": q_or_linker,
        "with_n_links": q_with_n_links,
        "link_counts": q_link_counts,
        "degree": q_degree,
        "with_linked_values": q_with_linked_values,
        "fs_score_tf": q_fs_score_tf,
        "label_sample": q_label_sample,
        "score_waterfall": q_score_waterfall,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "fingerprints": q_fingerprints,
        "exact_dup_groups": q_exact_dup_groups,
        "tfidf_idf": q_tfidf_idf,
        "rare_terms": q_rare_terms,
        "jaccard_pairs": q_jaccard_pairs,
        "levenshtein_ratio": q_levenshtein_ratio,
        "jaro_winkler": q_jaro_winkler,
        "cosine_topk": q_cosine_topk,
        "embedding_norms": q_embedding_norms,
        "embedding_outliers": q_embedding_outliers,
        "minhash_lsh_block": q_minhash_lsh_block,
        "minhash_estimate": q_minhash_estimate,
        "simhash_pairs": q_simhash_pairs,
        "clean_phone": q_clean_phone,
        "clean_url": q_clean_url,
        "surt": q_surt,
        "blocklist_filter": q_blocklist_filter,
        "url_match_level": q_url_match_level,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "array_ops": q_array_ops,
        "prefix_filter_pairs": q_prefix_filter_pairs,
        "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "dup_token_spans": q_dup_token_spans,
        "dup_span_stats": q_dup_span_stats,
        "incremental_cc": q_incremental_cc,
        "cc_maintain": q_cc_maintain,
        "cluster_events": q_cluster_events,
        "cluster_cohesion": q_cluster_cohesion,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOKENS = "list_distinct(string_split_regex(lower(trim(text)), '\\s+'))"


def _phash_cte(src: str) -> str:
    """Shared phash oracle prefix over ``src`` (doc_id, text): recompute
    the 64-bit grid-dHash of every row in pure SQL — hex-decoded utf-8
    bytes, 72 floor-partitioned chunk sums (first 4608 bytes), integer
    cross-multiplied dHash comparisons, HUGEINT two's-complement bit
    packing.  Mirrors multimodal/__init__.py:_phash_batch bit for bit;
    rows under 72 bytes are excluded (NULL hash on the Spark side)."""
    return f"""
            WITH src AS MATERIALIZED ({src}),
            d AS MATERIALIZED (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) AS len
              FROM src
            ),
            m AS MATERIALIZED (
              SELECT doc_id, hx, least(len, 4608)::BIGINT AS m
              FROM d WHERE len >= 72
            ),
            bytes AS (
              SELECT doc_id,
                     CAST(('0x' || substr(hx, (2*t.i + 1)::INT, 2)) AS BIGINT)
                       AS bv,
                     (t.i * 72) // m.m AS cell
              FROM m, unnest(generate_series(0, m.m - 1)) AS t(i)
            ),
            cells AS MATERIALIZED (
              SELECT doc_id, cell, sum(bv) AS s, count(*) AS n
              FROM bytes GROUP BY doc_id, cell
            ),
            bits AS (
              SELECT a.doc_id, (a.cell // 9) * 8 + (a.cell % 9) AS b
              FROM cells a JOIN cells r
                ON a.doc_id = r.doc_id AND r.cell = a.cell + 1
              WHERE a.cell % 9 <= 7 AND r.s * a.n > a.s * r.n
            ),
            ph AS MATERIALIZED (
              SELECT m.doc_id,
                     CAST(CASE WHEN coalesce(t.s, 0) >= 9223372036854775808::HUGEINT
                               THEN t.s - 18446744073709551616::HUGEINT
                               ELSE coalesce(t.s, 0) END AS BIGINT) AS ph
              FROM m LEFT JOIN (
                SELECT doc_id, sum(1::HUGEINT << b::INT) AS s
                FROM bits GROUP BY doc_id
              ) t ON m.doc_id = t.doc_id
            )"""


# SQL twin of _PHASH_TWIN_EXPR (DuckDB `//` == Spark `div` on ints)
_PHASH_TWIN_SQL = (
    "substr(text, 1, (length(text)//2) - 1)"
    " || repeat('~', (length(text)+71)//72)"
    " || substr(text, (length(text)//2) + (length(text)+71)//72)"
)


def _mis_work_cte() -> str:
    """Shared recursive-CTE prefix: token-Jaccard sims over
    source-blocked documents, the symmetrized tight (>=0.6) graph with
    self-loops, and the local-minima `work` rounds computing the
    id-order greedy MIS (mirrors linker/canopy.py:canopy_centers).
    Used by the canopy_assign and pivot_clustering oracles."""
    return f"""
            WITH RECURSIVE d AS MATERIALIZED (
              SELECT doc_id, source, {_TOKENS} AS tokens FROM documents
            ),
            sims AS MATERIALIZED (
              SELECT a.doc_id AS l, b.doc_id AS r,
                     CASE WHEN len(list_intersect(a.tokens, b.tokens)) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / len(list_distinct(
                                     list_concat(a.tokens, b.tokens)))
                     END AS s
              FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
            ),
            loose_e AS MATERIALIZED (SELECT l, r FROM sims WHERE s >= 0.3),
            tight_sym AS MATERIALIZED (
              SELECT l AS u, r AS v FROM sims WHERE s >= 0.6
              UNION ALL SELECT r, l FROM sims WHERE s >= 0.6
              UNION ALL SELECT doc_id, doc_id FROM d  -- self-loops: isolated
            ),
            -- local-minima rounds == id-order greedy MIS of the tight
            -- graph; mirrors linker/canopy.py:canopy_centers exactly
            work(status, u, v) AS (
              SELECT 'e', u, v FROM tight_sym
              UNION ALL
              SELECT new_status, u, v FROM (
                SELECT u, v,
                       CASE WHEN u = v AND ctr_u = 1 THEN 'c'
                            WHEN ctr_u = 0 AND cov_u = 0
                             AND ctr_v = 0 AND cov_v = 0 THEN 'e'
                            ELSE NULL END AS new_status
                FROM (
                  SELECT u, v, ctr_u, ctr_v,
                         max(CASE WHEN ctr_v = 1 AND u <> v THEN 1 ELSE 0 END)
                           OVER (PARTITION BY u) AS cov_u,
                         max(CASE WHEN ctr_u = 1 AND u <> v THEN 1 ELSE 0 END)
                           OVER (PARTITION BY v) AS cov_v
                  FROM (
                    SELECT u, v,
                           1 - max(CASE WHEN v < u THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY u) AS ctr_u,
                           1 - max(CASE WHEN u < v THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY v) AS ctr_v
                    FROM work WHERE status = 'e'
                  )
                )
              ) WHERE new_status IS NOT NULL
            ),
            centers AS (SELECT u AS c FROM work WHERE status = 'c')"""



_META_BLOCK_CTES = """docs2 AS (
              SELECT doc_id AS record_id, substr(text, 1, 20) AS fp20,
                     lang, source, n_chars - n_chars % 50 AS len_bin
              FROM documents
            ),
            blocks AS (
              SELECT DISTINCT record_id, block FROM (
                SELECT record_id, '0' || chr(31) || fp20 AS block
                FROM docs2 WHERE fp20 IS NOT NULL
                UNION ALL
                SELECT record_id,
                       '1' || chr(31) || lang || chr(31) || source AS block
                FROM docs2 WHERE lang IS NOT NULL AND source IS NOT NULL
                UNION ALL
                SELECT record_id, '2' || chr(31) || CAST(len_bin AS VARCHAR)
                FROM docs2 WHERE len_bin IS NOT NULL
              )
            ),
            b2 AS (
              SELECT record_id, block FROM blocks
              WHERE block IN (
                SELECT block FROM blocks GROUP BY block HAVING count(*) <= 60
              )
            ),
            p AS (
              SELECT a.record_id AS record_id_l, b.record_id AS record_id_r,
                     count(*) AS cbs
              FROM b2 a JOIN b2 b
                ON a.block = b.block AND a.record_id < b.record_id
              GROUP BY 1, 2
            ),
            nbc AS (SELECT record_id, count(*) AS nb FROM b2 GROUP BY 1),
            graph AS (
              SELECT record_id_l, record_id_r, cbs,
                     cbs / (nbl.nb + nbr.nb - cbs) AS js
              FROM p
              JOIN nbc nbl ON p.record_id_l = nbl.record_id
              JOIN nbc nbr ON p.record_id_r = nbr.record_id
            )"""


_METRICS_MICRO_SELECT = """
                   n_naive::BIGINT AS n_naive,
                   n_candidates::BIGINT AS n_candidates,
                   n_true::BIGINT AS n_true, n_found::BIGINT AS n_found,
                   (CASE WHEN n_naive > 0
                         THEN (1000000 * (n_naive - n_candidates)) // n_naive
                         ELSE 0 END)::BIGINT AS reduction_micro,
                   (CASE WHEN n_true > 0
                         THEN (1000000 * n_found) // n_true
                         ELSE 0 END)::BIGINT AS completeness_micro,
                   (CASE WHEN n_candidates > 0
                         THEN (1000000 * n_found) // n_candidates
                         ELSE 0 END)::BIGINT AS quality_micro
"""


def _scheme_metrics_sql(name: str, cond: str) -> str:
    """One scorecard row (scheme, n_naive, ..., quality_micro) for a
    blocking join condition over the documents self-join — mirrors
    mismo_spark.linker.eval.blocking_metrics with the ratios in integer
    micro-units (exact on both engines) and shared-50-char-fingerprint
    ground truth (nonzero n_true at every shipped sf)."""
    return f"""
            SELECT '{name}' AS scheme, {_METRICS_MICRO_SELECT}
            FROM (
              WITH cand AS (
                SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                FROM documents a JOIN documents b
                  ON {cond} AND a.doc_id < b.doc_id
              ),
              troo AS (
                SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                FROM documents a JOIN documents b
                  ON substr(a.text, 1, 50) = substr(b.text, 1, 50)
                 AND a.doc_id < b.doc_id
              )
              SELECT
                (SELECT (count(*) * (count(*) - 1)) // 2 FROM documents)
                  AS n_naive,
                (SELECT count(*) FROM cand) AS n_candidates,
                (SELECT count(*) FROM troo) AS n_true,
                (SELECT count(*) FROM cand JOIN troo USING (l, r)) AS n_found
            )
    """


def _lang_markers_sql(words: list[str], col: str = "text") -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    toks = _TOKENS if col == "text" else _TOKENS.replace("text", col)
    return f"len(list_intersect({toks}, [{arr}]))"


def _simhash_oracle_sql(
    *, n_bits: int = 32, seed: int = 42, n_blocks: int = 4, max_hamming: int = 3
) -> str:
    """DuckDB replay of simhash_signatures(md5_32) + block-permutation
    near-dup: token hash = first 8 md5 hex chars as int, bit b of the
    signature = strict majority of token-hash bit b, candidate pairs =
    equi-join on any of the n_blocks hash blocks, then exact hamming."""
    width = n_bits // n_blocks
    mask = (1 << width) - 1
    bit_sums = ",\n                   ".join(
        f"sum((h >> {b}) & 1) AS b{b}" for b in range(n_bits)
    )
    sh_expr = "\n                 + ".join(
        f"(CASE WHEN 2 * b{b} > n THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(n_bits)
    )
    blocks = ", ".join(str(b) for b in range(n_blocks))
    return f"""
        WITH d AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
        ex AS (SELECT doc_id, unnest(toks) AS t FROM d),
        -- t = '' only arises from empty/whitespace text (spark's
        -- tokenize returns [] there; exclude to match)
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(t || ':{seed}'), 1, 8))::BIGINT AS h
              FROM ex WHERE t <> ''),
        sums AS (SELECT doc_id, count(*) AS n,
                   {bit_sums}
                 FROM h GROUP BY doc_id),
        sh AS (SELECT doc_id,
                   {sh_expr}
               AS sh FROM sums),
        blk AS (SELECT doc_id, sh, b, (sh >> (b * {width})) & {mask} AS key
                FROM sh, (SELECT unnest([{blocks}]) AS b) bb),
        cand AS (SELECT DISTINCT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                        a.sh AS sh_l, b.sh AS sh_r
                 FROM blk a JOIN blk b
                   ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT record_id_l, record_id_r,
               bit_count(xor(sh_l, sh_r))::BIGINT AS hamming
        FROM cand WHERE bit_count(xor(sh_l, sh_r)) <= {max_hamming}
    """


def _minhash_oracle_sql(
    *,
    shingle_size: int = 2,
    band_size: int = 2,
    n_bands: int = 8,
    seed: int = 42,
    min_jaccard: float = 0.2,
) -> str:
    """DuckDB replay of minhash_near_duplicates(hasher='md5'): word
    shingles → per-hash lexicographic-min md5 digest → '|'-joined band
    keys → bucket self-join → exact shingle-set Jaccard filter."""
    k = shingle_size
    n_hashes = band_size * n_bands
    mins = ",\n                   ".join(
        f"min(md5(s || ':{seed + i}')) AS m{i}" for i in range(n_hashes)
    )
    bands_union = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '|' || ".join(f"m{b * band_size + j}" for j in range(band_size))
        + " AS key FROM mins"
        for b in range(n_bands)
    )
    jac = (
        "CASE WHEN len(list_intersect(sl, sr)) = 0 THEN 0.0 "
        "ELSE len(list_intersect(sl, sr))::DOUBLE "
        "/ len(list_distinct(list_concat(sl, sr))) END"
    )
    return f"""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(toks) < {k}
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(
                               range(1, len(toks) - {k} + 2),
                               i -> array_to_string(toks[i:i + {k - 1}], ' '))
                   END) AS sh
          FROM d
        ),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        mins AS (SELECT doc_id,
                   {mins}
                 FROM ex GROUP BY doc_id),
        bands AS (
              {bands_union}
        ),
        cand AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        j AS (SELECT c.l, c.r, sa.sh AS sl, sb.sh AS sr
              FROM cand c
              JOIN sets sa ON sa.doc_id = c.l
              JOIN sets sb ON sb.doc_id = c.r),
        jac AS (SELECT l, r, {jac} AS jaccard_sim FROM j)
        SELECT l AS record_id_l, r AS record_id_r,
               round(jaccard_sim, 6) AS jaccard_sim
        FROM jac WHERE jaccard_sim >= {min_jaccard}
    """


def _minhash_estimate_oracle_sql(
    *,
    shingle_size: int = 2,
    band_size: int = 2,
    n_bands: int = 8,
    seed: int = 42,
    min_jaccard: float = 0.2,
) -> str:
    """DuckDB replay of minhash_near_duplicates(verify='estimate',
    hasher='md5'): same shingle/signature/band chain, but the verify
    step is the agreeing-component fraction of the sketches."""
    k = shingle_size
    n_hashes = band_size * n_bands
    mins = ",\n                   ".join(
        f"min(md5(s || ':{seed + i}')) AS m{i}" for i in range(n_hashes)
    )
    bands_union = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '|' || ".join(f"m{b * band_size + j}" for j in range(band_size))
        + " AS key FROM mins"
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"CASE WHEN ma.m{i} = mb.m{i} THEN 1 ELSE 0 END"
        for i in range(n_hashes)
    )
    return f"""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(toks) < {k}
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(
                               range(1, len(toks) - {k} + 2),
                               i -> array_to_string(toks[i:i + {k - 1}], ' '))
                   END) AS sh
          FROM d
        ),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        mins AS (SELECT doc_id,
                   {mins}
                 FROM ex GROUP BY doc_id),
        bands AS (
              {bands_union}
        ),
        cand AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        est AS (SELECT c.l, c.r,
                       ({agree})::DOUBLE / {n_hashes} AS jaccard_est
                FROM cand c
                JOIN mins ma ON ma.doc_id = c.l
                JOIN mins mb ON mb.doc_id = c.r)
        SELECT l AS record_id_l, r AS record_id_r,
               round(jaccard_est, 6) AS jaccard_est
        FROM est WHERE jaccard_est >= {min_jaccard}
    """


def _name_level_oracle_sql() -> str:
    """DuckDB replay of q_name_match_level: same deterministic name
    synthesis, then the NameMatchLevel CASE in the reference's order
    (NULL, EXACT, GIVEN_SURNAME, NICKNAMES, TYPO, INITIALS, ELSE —
    mismo/lib/name/_compare.py:72-107)."""
    from mismo_spark.lib.name import _NICKNAME_PAIRS

    givens = ", ".join(f"'{g}'" for g in _GIVENS)
    surnames = ", ".join(f"'{s}'" for s in _SURNAMES)
    nick_case = " ".join(
        f"WHEN '{c}' THEN '{n}'" for c, n in _NICK_OF.items()
    )
    alias_lits = sorted(
        {f"'{a.lower()}#{b.lower()}'" for a, b in _NICKNAME_PAIRS}
        | {f"'{b.lower()}#{a.lower()}'" for a, b in _NICKNAME_PAIRS}
    )
    aliases = ", ".join(alias_lits)
    return f"""
        WITH base AS (
          SELECT c_custkey,
                 ([{givens}])[(c_custkey % 9) + 1] AS g,
                 ([{surnames}])[(c_custkey % 7) + 1] AS s,
                 ([{givens}])[((c_custkey + 4) % 9) + 1] AS galt,
                 c_custkey % 7 AS m
          FROM customer
        ),
        rhs AS (
          SELECT c_custkey, g, s,
                 CASE m
                   WHEN 2 THEN CASE g {nick_case} ELSE g END
                   WHEN 3 THEN substr(g, 1, 1) || substr(g, 3)
                   WHEN 4 THEN substr(g, 1, 1)
                   WHEN 5 THEN galt
                   WHEN 6 THEN NULL
                   ELSE g END AS g2,
                 CASE WHEN m = 1 THEN 'MR' ELSE '' END AS p2
          FROM base
        )
        SELECT c_custkey,
          CASE
            WHEN g IS NULL OR s IS NULL OR g2 IS NULL THEN 0
            -- all non-given fields are '' on both sides except prefix
            WHEN p2 = '' AND g = g2 THEN 1
            WHEN g = g2 THEN 2
            WHEN (lower(trim(g)) || '#' || lower(trim(g2))) IN ({aliases})
                 OR lower(trim(g)) = lower(trim(g2)) THEN 3
            WHEN damerau_levenshtein(g, g2) <= 1
                 OR (damerau_levenshtein(g, g2) <= 2 AND length(g) > 5)
                 OR (contains(g, g2) AND length(g2) >= 3)
                 OR (contains(g2, g) AND length(g) >= 3) THEN 5
            WHEN substr(g, 1, 1) = substr(g2, 1, 1)
                 AND (length(g) = 1 OR length(g2) = 1) THEN 4
            ELSE 6
          END::BIGINT AS name_level
        FROM rhs
    """


def _email_level_case(f1: str, f2: str, u1: str, u2: str) -> str:
    """CASE mirroring EmailMatchLevel over normalized (full, user) pairs
    (mismo/lib/email/_core.py:93-133)."""
    return f"""CASE WHEN {f1} = {f2} THEN 0
        WHEN damerau_levenshtein({f1}, {f2}) <= 1 THEN 1
        WHEN {u1} = {u2} THEN 2
        WHEN damerau_levenshtein({u1}, {u2}) <= 1 THEN 3
        ELSE 4 END"""


def _emails_dimension_oracle_sql() -> str:
    """Mirrors q_emails_dimension: two left emails × one right email;
    the dimension takes the min level across combinations."""
    return f"""
        WITH raw AS (
          SELECT c_custkey,
                 'user' || (c_custkey % 97)::VARCHAR || '@mail.com' AS ea,
                 'alt' || (c_custkey % 7)::VARCHAR || '@mail.com' AS eb,
                 (CASE c_custkey % 5
                    WHEN 1 THEN 'user' || (c_custkey % 97)::VARCHAR || 'x'
                    WHEN 3 THEN 'user' || (c_custkey % 97)::VARCHAR || 'q'
                    WHEN 4 THEN 'zz' || (c_custkey % 13)::VARCHAR
                    ELSE 'user' || (c_custkey % 97)::VARCHAR END)
                 || (CASE WHEN c_custkey % 5 >= 2
                          THEN '@other.org' ELSE '@mail.com' END) AS er
          FROM customer
        ),
        norm AS (
          SELECT c_custkey,
                 replace(replace(lower(ea), '.', ''), '_', '') AS na,
                 replace(replace(lower(eb), '.', ''), '_', '') AS nb,
                 replace(replace(lower(er), '.', ''), '_', '') AS nr
          FROM raw
        ),
        parts AS (
          SELECT c_custkey, na, nb, nr,
                 string_split(na, '@')[1] AS ua,
                 string_split(nb, '@')[1] AS ub,
                 string_split(nr, '@')[1] AS ur
          FROM norm
        )
        SELECT c_custkey,
               least({_email_level_case('na', 'nr', 'ua', 'ur')},
                     {_email_level_case('nb', 'nr', 'ub', 'ur')})::BIGINT
               AS email_level
        FROM parts
    """


def _address_level_oracle_sql() -> str:
    """Mirrors q_address_match_level.  The synthesized street1 strings
    are already normalized, so the oracle computes the level cascade
    (mismo/lib/geo/_address.py:135-202) from the known parsed parts —
    if the Spark-side featurize/parse diverged from those parts, the
    levels (and hashes) would diverge."""
    streets = ", ".join(f"'{s}'" for s in _STREETS)
    cities = ", ".join(f"'{c}'" for c in _CITIES)
    states = ", ".join(f"'{s}'" for s in _STATES)
    ratio = (
        "((greatest(length({a}), length({b})) - damerau_levenshtein({a}, {b}))"
        " / greatest(length({a}), length({b})))"
    )
    snr = ratio.format(a="name_l", b="name_r")
    ctr = ratio.format(a="city_l", b="city_r")
    pcr = ratio.format(a="postal_l", b="postal_r")
    return f"""
        WITH pools AS (
          SELECT c_custkey, c_custkey % 6 AS m,
                 [{streets}] AS sts, [{cities}] AS cts, [{states}] AS sas
          FROM customer
        ),
        parts AS (
          SELECT c_custkey, m,
                 ((c_custkey % 89) + 1)::VARCHAR AS num_l,
                 ((c_custkey % 89) + 2)::VARCHAR AS num_alt,
                 sts[(c_custkey % 5 + 1)::INT] AS name_l,
                 sts[((c_custkey + 2) % 5 + 1)::INT] AS name_alt,
                 'X' || substring(sts[(c_custkey % 5 + 1)::INT], 2) AS name_typo,
                 cts[(c_custkey % 4 + 1)::INT] AS city_l,
                 cts[((c_custkey + 1) % 4 + 1)::INT] AS city_alt,
                 sas[(c_custkey % 5 + 1)::INT] AS state_l,
                 sas[((c_custkey + 1) % 5 + 1)::INT] AS state_alt,
                 ((c_custkey * 13) % 89999 + 10000)::VARCHAR AS postal_l,
                 ((c_custkey * 13) % 89999 + 10001)::VARCHAR AS postal_alt
          FROM pools
        ),
        sides AS (
          SELECT c_custkey, m, num_l, name_l, city_l, state_l, postal_l,
                 CASE WHEN m = 2 THEN num_l
                      WHEN m IN (3, 4, 5) THEN num_alt
                      ELSE num_l END AS num_r,
                 CASE WHEN m = 2 THEN name_typo
                      WHEN m IN (3, 4, 5) THEN name_alt
                      ELSE name_l END AS name_r,
                 CASE WHEN m IN (1, 4, 5) THEN city_alt ELSE city_l END AS city_r,
                 CASE WHEN m = 5 THEN state_alt ELSE state_l END AS state_r,
                 CASE WHEN m IN (2, 4, 5) THEN postal_alt
                      ELSE postal_l END AS postal_r
          FROM parts
        ),
        streets1 AS (
          SELECT *,
                 num_l || ' ' || name_l || ' ST' AS s1_l,
                 num_r || ' ' || name_r || ' ST' AS s1_r
          FROM sides
        )
        SELECT c_custkey,
               (CASE
                 WHEN s1_l = s1_r AND (city_l = city_r OR postal_l = postal_r)
                   THEN 0
                 WHEN (s1_l = s1_r AND length(s1_l) >= 5)
                   OR ({snr} > 0.9 AND {ctr} > 0.9)
                   OR ({snr} > 0.9 AND {pcr} >= 0.8)
                   OR (num_l = num_r AND {snr} > 0.4 AND {ctr} > 0.9)
                   THEN 1
                 WHEN postal_l = postal_r
                   OR (city_l = city_r AND state_l = state_r) THEN 2
                 WHEN state_l = state_r THEN 4
                 ELSE 6 END)::BIGINT AS addr_level
        FROM streets1
    """


def oracle_sql() -> dict[str, str]:
    from mismo_spark.graph import (
        core_numbers_oracle_sql,
        hits_oracle_sql,
        label_propagation_oracle_sql,
        pagerank_oracle_sql,
    )

    citation_edges = """SELECT doc_id AS src,
                      (doc_id * 17 + 7) % (SELECT count(*) FROM documents) AS dst
               FROM documents WHERE doc_id % 10 <> 0
               UNION ALL
               SELECT doc_id AS src,
                      (doc_id * 31 + 3) % (SELECT count(*) FROM documents) AS dst
               FROM documents WHERE doc_id % 10 <> 0"""

    pair_block = """
        SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
               a.lang, a.source, a.n_chars AS n_chars_l, b.n_chars AS n_chars_r,
               a.text AS text_l, b.text AS text_r
        FROM documents a JOIN documents b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    """
    sql = {
        "phash_docs": f"""
            {_phash_cte("SELECT doc_id, text FROM documents")}
            SELECT doc_id AS record_id, ph FROM ph
        """,
        "phash_pairs": f"""
            {_phash_cte(
                "SELECT doc_id, text FROM documents "
                "UNION ALL "
                "SELECT doc_id + 1000000, " + _PHASH_TWIN_SQL + " FROM documents"
            )}
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                   bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
            FROM ph a JOIN ph b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.ph, b.ph)) <= 3
        """,
        "key_counts": """
            SELECT lang, source, count(*)::BIGINT AS n
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
            GROUP BY lang, source
        """,
        "pair_counts_dedupe": """
            SELECT lang, source, (count(*) * (count(*) - 1) / 2)::BIGINT AS n
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
            GROUP BY lang, source
        """,
        "key_linker_block": f"""
            SELECT record_id_l, record_id_r FROM ({pair_block})
        """,
        "sorted_neighborhood": """
            WITH ranked AS (
              SELECT doc_id, row_number() OVER (ORDER BY source, doc_id) AS rk
              FROM documents WHERE source IS NOT NULL
            )
            SELECT least(a.doc_id, b.doc_id) AS record_id_l,
                   greatest(a.doc_id, b.doc_id) AS record_id_r
            FROM ranked a JOIN ranked b ON b.rk - a.rk IN (1, 2)
        """,
        "key_linker_skew": """
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
        """,
        "or_linker": """
            WITH d AS (
              SELECT doc_id, lang, source, floor(n_chars / 50)::BIGINT AS len_bucket
              FROM documents
            ),
            raw AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r, 'langsrc' AS rule
              FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                                AND a.doc_id < b.doc_id
              UNION ALL
              SELECT a.doc_id, b.doc_id, 'lenb'
              FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
                                AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   array_to_string(list_sort(list(DISTINCT rule)), ',') AS blocking_rules
            FROM raw GROUP BY record_id_l, record_id_r
        """,
        "with_n_links": """
            WITH links AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            )
            SELECT d.doc_id AS record_id,
                   coalesce(c.n, 0)::BIGINT AS n_links
            FROM documents d
            LEFT JOIN (SELECT l, count(DISTINCT r) AS n FROM links GROUP BY l) c
              ON d.doc_id = c.l
        """,
        "link_counts": """
            WITH links AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            ),
            withn AS (
              SELECT d.doc_id, coalesce(c.n, 0)::BIGINT AS n_links
              FROM documents d
              LEFT JOIN (SELECT l, count(DISTINCT r) AS n FROM links GROUP BY l) c
                ON d.doc_id = c.l
            )
            SELECT n_links, count(*)::BIGINT AS n_records
            FROM withn GROUP BY n_links
        """,
        "degree": """
            WITH links AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            ),
            both_dirs AS (
              SELECT l AS record_id, r AS neighbour FROM links
              UNION
              SELECT r, l FROM links
            )
            SELECT record_id, count(*)::BIGINT AS degree
            FROM both_dirs GROUP BY record_id
        """,
        "with_linked_values": """
            WITH links AS (
              SELECT a.doc_id AS l, b.doc_id AS r, b.n_chars
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            ),
            agged AS (
              SELECT l, max(n_chars) AS neighbour_max_chars,
                     array_to_string(
                       list_transform(list_sort(list(r)), x -> x::VARCHAR),
                       ',') AS neighbour_ids
              FROM links GROUP BY l
            )
            SELECT d.doc_id AS record_id, a.neighbour_max_chars, a.neighbour_ids
            FROM documents d LEFT JOIN agged a ON d.doc_id = a.l
        """,
        "connected_components": """
            -- single-key equi-blocking yields cliques ⇒ component = min id
            -- per (lang, source) group; null keys ⇒ singleton
            SELECT doc_id AS record_id,
                   CASE WHEN lang IS NULL OR source IS NULL THEN doc_id
                        ELSE min(doc_id) OVER (PARTITION BY lang, source)
                   END AS component
            FROM documents
        """,
        "array_ops": """
            WITH t AS (
              SELECT c_custkey,
                     [c_custkey % 5, c_custkey % 7, c_custkey % 11] AS a,
                     [c_custkey % 2, c_custkey % 3] AS b
              FROM customer
            )
            SELECT c_custkey,
              array_to_string(flatten(list_transform(a,
                x -> list_transform(b,
                  y -> x::VARCHAR || ':' || y::VARCHAR))), ',') AS combos,
              round(list_sum(list_transform(a, x -> x::DOUBLE)) / len(a), 6)
                AS mean_a,
              CAST(list_sort(a)[2] AS DOUBLE) AS med_a,
              round(list_sum(list_transform(b, x -> x::DOUBLE)), 6) AS sum_b
            FROM t
        """,
        "prefix_filter_pairs": f"""
            WITH d AS (
              SELECT doc_id, {_TOKENS} AS tokens FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     CASE WHEN len(list_intersect(a.tokens, b.tokens)) = 0
                          THEN 0.0
                          ELSE len(list_intersect(a.tokens, b.tokens))::DOUBLE
                               / (len(a.tokens) + len(b.tokens)
                                  - len(list_intersect(a.tokens, b.tokens)))
                     END AS j
              FROM d a JOIN d b ON a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r, round(j, 6) AS jaccard
            FROM pairs WHERE j >= 0.5
        """,
        "tfidf_cosine_pairs": """
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*)::DOUBLE AS tf
              FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
              GROUP BY doc_id, tok
            ),
            docfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
            w AS (
              SELECT doc_id, tok,
                     tf * ln((SELECT count(*)::DOUBLE FROM d) / df) AS w
              FROM tf JOIN docfreq USING (tok)
            ),
            nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
            wn AS (
              SELECT w.doc_id, tok,
                     CASE WHEN nrm > 0 THEN w / nrm ELSE 0.0 END AS wn
              FROM w JOIN nrm ON w.doc_id = nrm.doc_id
            )
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                   round(sum(a.wn * b.wn), 6) AS cosine
            FROM wn a JOIN wn b ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING round(sum(a.wn * b.wn), 6) >= 0.2
        """,
        "bm25_topk": f"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ),
            tok AS (
              SELECT doc_id, unnest(toks) AS term FROM d
            ),
            tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf
              FROM tok WHERE term <> '' GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
            q AS (
              SELECT * FROM (VALUES
                ('q1', ['hash', 'join']),
                ('q2', ['vector', 'scan', 'batch']),
                ('q3', ['customer', 'order'])
              ) AS t(query_id, terms)
            ),
            qt AS (
              SELECT query_id, unnest(list_distinct(terms)) AS term FROM q
            ),
            idf AS (
              SELECT term,
                     ln(1.0 + ((SELECT count(*)::DOUBLE FROM d) - df + 0.5)
                              / (df + 0.5)) AS idf
              FROM dfreq
            ),
            scored AS (
              SELECT query_id, tf.doc_id,
                     sum((idf * (tf * {1.2 + 1.0!r}))
                         / (tf + {1.2!r} * ({1.0 - 0.75!r}
                              + ({0.75!r} * dl) / (SELECT avg(dl) FROM dl))))
                       AS score
              FROM tf
              JOIN qt USING (term)
              JOIN idf USING (term)
              JOIN dl ON tf.doc_id = dl.doc_id
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT query_id, doc_id, score,
                     row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, doc_id
                     ) AS rank
              FROM scored
            )
            SELECT query_id, doc_id,
                   {_micro_sql("score")} AS score_micro,
                   rank::BIGINT AS rank
            FROM ranked WHERE rank <= 10
        """,
        "meta_blocking_graph": f"""
            WITH {_META_BLOCK_CTES}
            SELECT record_id_l, record_id_r, cbs::BIGINT AS cbs,
                   {_micro_sql("js")} AS js_micro
            FROM graph
        """,
        "meta_blocking_cnp": f"""
            WITH {_META_BLOCK_CTES},
            incident AS (
              SELECT record_id_l AS node, record_id_r AS other, js FROM graph
              UNION ALL
              SELECT record_id_r AS node, record_id_l AS other, js FROM graph
            ),
            kept AS (
              SELECT DISTINCT least(node, other) AS record_id_l,
                              greatest(node, other) AS record_id_r
              FROM (
                SELECT node, other,
                       row_number() OVER (
                         PARTITION BY node ORDER BY js DESC, other
                       ) AS rk
                FROM incident
              ) WHERE rk <= 3
            )
            SELECT g.record_id_l, g.record_id_r, g.cbs::BIGINT AS cbs,
                   {_micro_sql("g.js")} AS js_micro
            FROM graph g
            JOIN kept ON g.record_id_l = kept.record_id_l
                     AND g.record_id_r = kept.record_id_r
        """,
        "unlinkables": f"""
            WITH pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r,
                     a.n_chars AS nl, b.n_chars AS nr
              FROM documents a JOIN documents b
                ON ((a.lang = b.lang AND a.source = b.source)
                    OR substr(a.text, 1, 50) = substr(b.text, 1, 50))
                   AND a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT l, r,
                     CASE
                       WHEN nl = nr THEN 0.6::DOUBLE / 0.01::DOUBLE
                       WHEN abs(nl - nr) <= 20 THEN 0.3::DOUBLE / 0.09::DOUBLE
                       ELSE 0.1::DOUBLE / 0.9::DOUBLE
                     END AS odds
              FROM pairs
            ),
            halves AS (
              SELECT l AS record_id, odds FROM scored
              UNION ALL
              SELECT r AS record_id, odds FROM scored
            ),
            best AS (SELECT record_id, max(odds) AS best FROM halves GROUP BY 1),
            perrec AS (
              SELECT d.doc_id AS record_id, b.best
              FROM documents d LEFT JOIN best b ON d.doc_id = b.record_id
            ),
            hist AS (SELECT best, count(*) AS n_records FROM perrec GROUP BY 1),
            cum AS (
              SELECT best, n_records,
                     sum(n_records) OVER (
                       ORDER BY best ASC NULLS FIRST
                       ROWS UNBOUNDED PRECEDING
                     ) AS cum_records
              FROM hist
            )
            SELECT {_micro_sql("best")} AS best_micro,
                   n_records::BIGINT AS n_records,
                   cum_records::BIGINT AS cum_records,
                   {_micro_sql("cum_records / (SELECT count(*) FROM documents)")}
                     AS cum_prop_micro
            FROM cum
        """,
        "calibration_curve": f"""
            WITH pairs AS (
              SELECT a.n_chars AS nl, b.n_chars AS nr,
                     (substr(a.text, 1, 50) = substr(b.text, 1, 50)) AS y
              FROM documents a JOIN documents b
                ON ((a.lang = b.lang AND a.source = b.source)
                    OR substr(a.text, 1, 50) = substr(b.text, 1, 50))
                   AND a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT CASE
                       WHEN nl = nr THEN 0.6::DOUBLE / 0.01::DOUBLE
                       WHEN abs(nl - nr) <= 20 THEN 0.3::DOUBLE / 0.09::DOUBLE
                       ELSE 0.1::DOUBLE / 0.9::DOUBLE
                     END AS odds,
                     y
              FROM pairs
            ),
            probs AS (
              SELECT odds / (1.0 + odds) AS p,
                     CASE WHEN y THEN 1.0 ELSE 0.0 END AS yd
              FROM scored
            ),
            binned AS (
              SELECT least(CAST(floor(p * 10.0) AS BIGINT), 9) AS bin, p, yd
              FROM probs
            ),
            agg AS (
              SELECT bin, count(*) AS n_pairs, avg(p) AS mean_predicted,
                     avg(yd) AS fraction_matched
              FROM binned GROUP BY bin
            )
            SELECT bin,
                   {_micro_sql("bin / 10.0")} AS p_lo_micro,
                   {_micro_sql("(bin + 1) / 10.0")} AS p_hi_micro,
                   n_pairs::BIGINT AS n_pairs,
                   {_micro_sql("mean_predicted")} AS mean_predicted_micro,
                   {_micro_sql("fraction_matched")} AS fraction_matched_micro
            FROM agg
        """,
        "pr_curve": """
            WITH pairs AS (
              SELECT a.n_chars AS n_chars_l, b.n_chars AS n_chars_r,
                     substr(a.text, 1, 50) AS fp_l,
                     substr(b.text, 1, 50) AS fp_r
              FROM documents a JOIN documents b
                ON ((a.lang = b.lang AND a.source = b.source)
                    OR substr(a.text, 1, 50) = substr(b.text, 1, 50))
                   AND a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT CASE
                       WHEN n_chars_l = n_chars_r
                         THEN 0.6::DOUBLE / 0.01::DOUBLE
                       WHEN abs(n_chars_l - n_chars_r) <= 20
                         THEN 0.3::DOUBLE / 0.09::DOUBLE
                       ELSE 0.1::DOUBLE / 0.9::DOUBLE
                     END AS threshold,
                     (fp_l = fp_r) AS y
              FROM pairs
            ),
            per AS (
              SELECT threshold,
                     sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
                     sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg
              FROM scored GROUP BY threshold
            ),
            cum AS (
              SELECT threshold,
                sum(n_pos) OVER (ORDER BY threshold DESC
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS tp,
                sum(n_neg) OVER (ORDER BY threshold DESC
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS fp,
                (sum(n_pos) OVER ()
                 - sum(n_pos) OVER (ORDER BY threshold DESC
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS fn
              FROM per
            ),
            micro AS (
              SELECT round(threshold * 1e6)::BIGINT AS threshold_micro,
                     tp, fp, fn,
                     (1000000 * tp) // (tp + fp) AS precision_micro,
                     CASE WHEN tp + fn > 0
                          THEN (1000000 * tp) // (tp + fn)
                          ELSE 0 END AS recall_micro
              FROM cum
            )
            SELECT threshold_micro, tp, fp, fn,
                   precision_micro::BIGINT AS precision_micro,
                   recall_micro::BIGINT AS recall_micro,
                   CASE WHEN precision_micro + recall_micro > 0
                        THEN (2 * precision_micro * recall_micro)
                             // (precision_micro + recall_micro)
                        ELSE 0 END::BIGINT AS f1_micro
            FROM micro
        """,
        "dup_token_spans": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            sh0 AS (
              SELECT doc_id, unnest(range(0, len(toks) - 5 + 1)) AS pos, toks
              FROM d WHERE len(toks) >= 5
            ),
            sh AS (
              SELECT doc_id, pos,
                     array_to_string(toks[pos + 1 : pos + 5], ' ') AS g
              FROM sh0
            ),
            cnt AS (SELECT g FROM sh GROUP BY g HAVING count(*) >= 2),
            dup AS (SELECT doc_id, pos FROM sh JOIN cnt USING (g)),
            marked AS (
              SELECT doc_id, pos,
                CASE WHEN max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= pos - 1
                     THEN 0 ELSE 1 END AS is_new
              FROM dup
            ),
            isl AS (
              SELECT doc_id, pos,
                     sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
              FROM marked
            )
            SELECT doc_id AS record_id,
                   min(pos)::BIGINT AS span_start,
                   (max(pos) + 4)::BIGINT AS span_end,
                   (max(pos) + 4 - min(pos) + 1)::BIGINT AS span_tokens
            FROM isl GROUP BY doc_id, island
        """,
        "dup_span_stats": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            sh0 AS (
              SELECT doc_id, unnest(range(0, len(toks) - 5 + 1)) AS pos, toks
              FROM d WHERE len(toks) >= 5
            ),
            sh AS (
              SELECT doc_id, pos,
                     array_to_string(toks[pos + 1 : pos + 5], ' ') AS g
              FROM sh0
            ),
            cnt AS (SELECT g FROM sh GROUP BY g HAVING count(*) >= 2),
            dup AS (SELECT doc_id, pos FROM sh JOIN cnt USING (g)),
            marked AS (
              SELECT doc_id, pos,
                CASE WHEN max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= pos - 1
                     THEN 0 ELSE 1 END AS is_new
              FROM dup
            ),
            isl AS (
              SELECT doc_id, pos,
                     sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
              FROM marked
            ),
            spans AS (
              SELECT doc_id,
                     (max(pos) + 4 - min(pos) + 1) AS span_tokens
              FROM isl GROUP BY doc_id, island
            ),
            per_doc AS (
              SELECT doc_id, count(*)::BIGINT AS n_spans,
                     sum(span_tokens)::BIGINT AS dup_tokens
              FROM spans GROUP BY doc_id
            )
            SELECT d.doc_id AS record_id,
                   len(d.toks)::BIGINT AS n_tokens,
                   coalesce(p.n_spans, 0)::BIGINT AS n_spans,
                   coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
                   CASE WHEN len(d.toks) > 0
                        THEN round(coalesce(p.dup_tokens, 0)::DOUBLE
                                   / len(d.toks), 6)
                        ELSE 0.0 END AS dup_token_frac
            FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "blocking_metrics": f"""
            WITH cand AS (
              SELECT DISTINCT least(a.doc_id, b.doc_id) AS l,
                              greatest(a.doc_id, b.doc_id) AS r
              FROM documents a JOIN documents b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            troo AS (
              SELECT DISTINCT least(a.doc_id, b.doc_id) AS l,
                              greatest(a.doc_id, b.doc_id) AS r
              FROM documents a JOIN documents b
                ON substr(a.text, 1, 50) = substr(b.text, 1, 50)
               AND a.doc_id < b.doc_id
            ),
            counts AS (
              SELECT
                (SELECT (count(*) * (count(*) - 1)) // 2 FROM documents)
                  AS n_naive,
                (SELECT count(*) FROM cand) AS n_candidates,
                (SELECT count(*) FROM troo) AS n_true,
                (SELECT count(*) FROM cand JOIN troo USING (l, r)) AS n_found
            )
            SELECT {_METRICS_MICRO_SELECT}
            FROM counts
        """,
        "blocking_schemes": (
            _scheme_metrics_sql(
                "lang_source", "a.lang = b.lang AND a.source = b.source"
            )
            + " UNION ALL "
            + _scheme_metrics_sql(
                "source_len200",
                "a.source = b.source AND a.n_chars // 200 = b.n_chars // 200",
            )
            + " UNION ALL "
            + _scheme_metrics_sql(
                "lang_len100",
                "a.lang = b.lang AND a.n_chars // 100 = b.n_chars // 100",
            )
        ),
        "incremental_cc": """
            WITH RECURSIVE
            d AS (
              SELECT doc_id, lang, source, n_chars // 200 AS bkt
              FROM documents
            ),
            e AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id FROM d a JOIN d b
                ON a.source = b.source AND a.bkt = b.bkt
               AND a.doc_id <> b.doc_id
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            mins AS (SELECT u, min(v) AS mn FROM reach GROUP BY u)
            SELECT d.doc_id AS record_id,
                   least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
            FROM d LEFT JOIN mins m ON m.u = d.doc_id
        """,
        "cc_maintain": """
            WITH RECURSIVE
            d AS (
              SELECT doc_id, lang, source, n_chars // 200 AS bkt
              FROM documents
            ),
            e0 AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
              UNION
              SELECT a.doc_id, b.doc_id FROM d a JOIN d b
                ON a.source = b.source AND a.bkt = b.bkt
               AND a.doc_id <> b.doc_id
            ),
            e AS (SELECT u, v FROM e0 WHERE (u + v) % 3 <> 0),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            mins AS (SELECT u, min(v) AS mn FROM reach GROUP BY u)
            SELECT d.doc_id AS record_id,
                   least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
            FROM d LEFT JOIN mins m ON m.u = d.doc_id
        """,
        "cluster_events": """
            WITH RECURSIVE
            d AS (
              SELECT doc_id, lang, source, n_chars // 200 AS bkt
              FROM documents
            ),
            e_old AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
            ),
            reach_old(u, v) AS (
              SELECT u, v FROM e_old
              UNION
              SELECT r.u, e.v FROM reach_old r JOIN e_old e ON r.v = e.u
            ),
            old_assign AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS old_component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM reach_old GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            e_new0 AS (
              SELECT u, v FROM e_old
              UNION
              SELECT a.doc_id, b.doc_id FROM d a JOIN d b
                ON a.source = b.source AND a.bkt = b.bkt
               AND a.doc_id <> b.doc_id
            ),
            e_new AS (SELECT u, v FROM e_new0 WHERE (u + v) % 3 <> 0),
            reach_new(u, v) AS (
              SELECT u, v FROM e_new
              UNION
              SELECT r.u, e.v FROM reach_new r JOIN e_new e ON r.v = e.u
            ),
            new_assign AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS new_component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM reach_new GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            xw AS (
              SELECT o.old_component, n.new_component,
                     count(*) AS n_records
              FROM old_assign o JOIN new_assign n USING (record_id)
              GROUP BY 1, 2
            ),
            fanout AS (
              SELECT old_component,
                     count(DISTINCT coalesce(new_component, -1)) AS n_dests
              FROM xw WHERE old_component IS NOT NULL GROUP BY 1
            ),
            contrib AS (
              SELECT xw.old_component, xw.new_component, xw.n_records,
                     f.n_dests
              FROM xw LEFT JOIN fanout f USING (old_component)
              WHERE xw.new_component IS NOT NULL
            ),
            agg AS (
              SELECT new_component,
                     sum(n_records)::BIGINT AS n_records,
                     count(DISTINCT old_component)::BIGINT
                       AS n_old_components,
                     sum(CASE WHEN old_component IS NULL THEN n_records
                              ELSE 0 END)::BIGINT AS n_new_records,
                     max(CASE WHEN n_dests > 1 THEN 1 ELSE 0 END) = 1
                       AS is_split
              FROM contrib GROUP BY new_component
            )
            SELECT new_component, n_records, n_old_components,
                   n_new_records,
                   n_old_components >= 2 AS is_merge, is_split,
                   CASE WHEN n_old_components = 0 THEN 'new'
                        WHEN n_old_components >= 2 AND is_split
                          THEN 'merge+split'
                        WHEN n_old_components >= 2 THEN 'merge'
                        WHEN is_split THEN 'split'
                        WHEN n_new_records > 0 THEN 'grew'
                        ELSE 'stable' END AS event
            FROM agg
        """,
        "cluster_cohesion": """
            WITH RECURSIVE
            d AS (SELECT doc_id, lang, source, n_chars FROM documents),
            e AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            assign AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM reach GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.n_chars AS ncl, b.n_chars AS ncr
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN ncl = ncr THEN 0.6 / 0.01
                          WHEN abs(ncl - ncr) <= 20 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS odds
              FROM pairs
            ),
            j AS (
              SELECT s.odds, a1.component AS cl, a2.component AS cr
              FROM scored s
              JOIN assign a1 ON s.record_id_l = a1.record_id
              JOIN assign a2 ON s.record_id_r = a2.record_id
            ),
            sizes AS (
              SELECT component, count(*) AS n_records
              FROM assign GROUP BY 1 HAVING count(*) >= 2
            ),
            intra AS (
              SELECT cl AS component, count(*) AS n_links,
                     sum(CASE WHEN odds < 1.0 THEN 1 ELSE 0 END)
                       AS n_weak_links,
                     min(odds) AS mn, avg(odds) AS av
              FROM j WHERE cl = cr GROUP BY 1
            )
            SELECT s.component, s.n_records::BIGINT AS n_records,
                   coalesce(i.n_links, 0)::BIGINT AS n_links,
                   coalesce(i.n_weak_links, 0)::BIGINT AS n_weak_links,
                   round(i.mn, 6) AS min_odds, round(i.av, 6) AS avg_odds,
                   round(coalesce(i.n_links, 0)
                         / (s.n_records * (s.n_records - 1) / 2.0), 6)
                     AS density
            FROM sizes s LEFT JOIN intra i USING (component)
        """,
        "missed_merges": """
            WITH RECURSIVE
            d AS (
              SELECT doc_id, lang, source, n_chars,
                     n_chars // 200 AS bkt
              FROM documents
            ),
            e AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            assign AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM reach GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.n_chars AS ncl, b.n_chars AS ncr
              FROM d a JOIN d b
                ON a.source = b.source AND a.bkt = b.bkt
               AND a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN ncl = ncr THEN 0.6 / 0.01
                          WHEN abs(ncl - ncr) <= 20 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS odds
              FROM pairs
            )
            SELECT s.record_id_l, s.record_id_r,
                   CAST(floor(s.odds * 1000000 + 0.5) AS BIGINT) AS odds_micro,
                   a1.component AS component_l, a2.component AS component_r
            FROM scored s
            JOIN assign a1 ON s.record_id_l = a1.record_id
            JOIN assign a2 ON s.record_id_r = a2.record_id
            WHERE s.odds >= 50.0 AND a1.component <> a2.component
        """,
        "monge_elkan": r"""
            WITH d AS (
              SELECT doc_id, lang, source,
                     list_slice(
                       string_split_regex(lower(trim(text)), '\s+'), 1, 12
                     ) AS toks
              FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.toks AS tl, b.toks AS tr
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   CAST(floor(
                     list_sum(list_transform(tl, x ->
                       list_max(list_transform(tr, y ->
                         CASE WHEN greatest(length(x), length(y)) = 0
                              THEN 1.0
                              ELSE 1.0 - levenshtein(x, y)::DOUBLE
                                   / greatest(length(x), length(y))
                         END))))
                     / len(tl) * 1000000 + 0.5) AS BIGINT) AS me_sim_micro
            FROM pairs
        """,
        "soft_tfidf": r"""
            WITH d AS (
              SELECT doc_id, lang, source,
                     list_slice(
                       string_split_regex(lower(trim(text)), '\s+'), 1, 8
                     ) AS toks
              FROM documents
            ),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM d),
            tf AS (
              SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
            ),
            dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM d),
            raw AS (
              SELECT tf.doc_id, tf.token,
                     (1.0 + ln(tf.tf)) * ln(n.n::DOUBLE / dfx.df) AS raw
              FROM tf JOIN dfx USING (token) CROSS JOIN n
            ),
            nrm AS (
              SELECT doc_id, sqrt(sum(raw * raw)) AS nrm
              FROM raw GROUP BY 1
            ),
            w AS (
              SELECT raw.doc_id, raw.token,
                     CASE WHEN nrm.nrm > 0 THEN raw.raw / nrm.nrm
                          ELSE 0.0 END AS v
              FROM raw JOIN nrm USING (doc_id)
            ),
            pairs AS (
              SELECT a.doc_id AS l, b.doc_id AS r FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            tp AS (
              SELECT p.l, p.r, wl.token AS wtok, wl.v AS vl,
                     wr.token AS utok, wr.v AS vr,
                     jaro_winkler_similarity(wl.token, wr.token) AS jw
              FROM pairs p
              JOIN w wl ON wl.doc_id = p.l
              JOIN w wr ON wr.doc_id = p.r
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY l, r, wtok ORDER BY jw DESC, utok ASC
              ) AS rn
              FROM tp
            ),
            best AS (
              SELECT l, r, vl * vr * jw AS c
              FROM ranked WHERE rn = 1 AND jw >= 0.85
            ),
            sums AS (SELECT l, r, sum(c) AS s FROM best GROUP BY 1, 2)
            SELECT p.l AS record_id_l, p.r AS record_id_r,
                   CAST(floor(coalesce(s.s, 0.0) * 1000000 + 0.5) AS BIGINT)
                     AS soft_tfidf_micro
            FROM pairs p LEFT JOIN sums s ON p.l = s.l AND p.r = s.r
        """,
        "golden_record": """
            WITH a AS (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY lang, source)
                       AS component,
                     text, lang, source, n_chars
              FROM documents
            ),
            base AS (
              SELECT component, count(*)::BIGINT AS n_records,
                     max(n_chars) AS n_chars
              FROM a GROUP BY component
            ),
            longest AS (
              SELECT component, text FROM (
                SELECT component, text, row_number() OVER (
                  PARTITION BY component
                  ORDER BY coalesce(length(text), -1) DESC, text DESC) AS rn
                FROM a) WHERE rn = 1
            ),
            first_s AS (
              SELECT component, source FROM (
                SELECT component, source, row_number() OVER (
                  PARTITION BY component ORDER BY doc_id ASC) AS rn
                FROM a) WHERE rn = 1
            ),
            mcounts AS (
              SELECT component, lang, count(*) AS c
              FROM a WHERE lang IS NOT NULL GROUP BY component, lang
            ),
            m AS (
              SELECT component, lang FROM (
                SELECT component, lang, row_number() OVER (
                  PARTITION BY component ORDER BY c DESC, lang ASC) AS rn
                FROM mcounts) WHERE rn = 1
            )
            SELECT base.component, base.n_records, longest.text,
                   first_s.source, m.lang, base.n_chars
            FROM base
            LEFT JOIN longest ON base.component = longest.component
            LEFT JOIN first_s ON base.component = first_s.component
            LEFT JOIN m ON base.component = m.component
        """,
        "tversky": f"""
            WITH d AS (
              SELECT doc_id, lang, source, {_TOKENS} AS tokens FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     len(list_intersect(a.tokens, b.tokens))::DOUBLE AS i,
                     len(a.tokens)::DOUBLE AS na, len(b.tokens)::DOUBLE AS nb
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   {_micro_sql("CASE WHEN (i + 0.5*(na-i) + 0.5*(nb-i)) = 0 THEN 0.0 ELSE i / (i + 0.5*(na-i) + 0.5*(nb-i)) END")}
                     AS dice_micro,
                   {_micro_sql("CASE WHEN (i + 0.8*(na-i) + 0.2*(nb-i)) = 0 THEN 0.0 ELSE i / (i + 0.8*(na-i) + 0.2*(nb-i)) END")}
                     AS tversky_82_micro
            FROM pairs
        """,
        "containment": f"""
            WITH d AS (
              SELECT doc_id, lang, source, {_TOKENS} AS tokens FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.tokens AS tl, b.tokens AS tr
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   CASE WHEN len(tl) = 0 THEN 0
                        ELSE CAST(floor(len(list_intersect(tl, tr))::DOUBLE
                                   / len(tl) * 1000000 + 0.5) AS BIGINT)
                   END AS containment_lr_micro,
                   CASE WHEN least(len(tl), len(tr)) = 0 THEN 0
                        ELSE CAST(floor(len(list_intersect(tl, tr))::DOUBLE
                                   / least(len(tl), len(tr)) * 1000000 + 0.5)
                                  AS BIGINT)
                   END AS overlap_coef_micro
            FROM pairs
        """,
        "bloom_prefilter": """
            WITH keys AS (SELECT DISTINCT md5(text) AS k FROM documents),
            kpos AS (SELECT k, unnest([0, 1, 2]) AS i FROM keys),
            kpp AS (
              SELECT (('0x' || substr(md5(k || ':42:' || i), 1, 8))::BIGINT
                      % 16384) AS p
              FROM kpos
            ),
            bloom AS (
              SELECT (p >> 5) AS word_idx,
                     bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
              FROM kpp GROUP BY 1
            ),
            mk AS (SELECT doc_id, md5(text) AS k FROM documents),
            ok AS (
              SELECT doc_id, md5(text || '|outsider') AS k FROM documents
            ),
            mpp AS (
              SELECT doc_id,
                     (('0x' || substr(md5(k || ':42:' || i), 1, 8))::BIGINT
                      % 16384) AS p
              FROM (SELECT doc_id, k, unnest([0, 1, 2]) AS i FROM mk)
            ),
            opp AS (
              SELECT doc_id,
                     (('0x' || substr(md5(k || ':42:' || i), 1, 8))::BIGINT
                      % 16384) AS p
              FROM (SELECT doc_id, k, unnest([0, 1, 2]) AS i FROM ok)
            ),
            mhit AS (
              SELECT mpp.doc_id,
                     min(CASE WHEN b.bits IS NOT NULL
                              AND (b.bits
                                   & (1::BIGINT << CAST(mpp.p % 32 AS INT)))
                                  = (1::BIGINT << CAST(mpp.p % 32 AS INT))
                              THEN 1 ELSE 0 END) = 1 AS member_hit
              FROM mpp LEFT JOIN bloom b ON b.word_idx = (mpp.p >> 5)
              GROUP BY mpp.doc_id
            ),
            ohit AS (
              SELECT opp.doc_id,
                     min(CASE WHEN b.bits IS NOT NULL
                              AND (b.bits
                                   & (1::BIGINT << CAST(opp.p % 32 AS INT)))
                                  = (1::BIGINT << CAST(opp.p % 32 AS INT))
                              THEN 1 ELSE 0 END) = 1 AS outsider_hit
              FROM opp LEFT JOIN bloom b ON b.word_idx = (opp.p >> 5)
              GROUP BY opp.doc_id
            )
            SELECT m.doc_id AS record_id, m.member_hit, o.outsider_hit
            FROM mhit m JOIN ohit o ON m.doc_id = o.doc_id
        """,
        "dup_lines": r"""
            WITH d AS (
              SELECT doc_id,
                     text || chr(10) || 'shared footer line for ' || source
                       AS text
              FROM documents
            ),
            l0 AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM d
            ),
            l1 AS (
              SELECT doc_id, unnest(range(0, len(ls))) AS line_no, ls
              FROM l0
            ),
            lr AS (
              SELECT doc_id, line_no, ls[line_no + 1] AS line FROM l1
            ),
            eligible AS (
              SELECT doc_id, md5(trim(line)) AS line_key, trim(line) AS tl
              FROM lr
              WHERE len(string_split_regex(trim(line), '\s+')) >= 3
            )
            SELECT line_key, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   min(tl) AS example
            FROM eligible GROUP BY line_key
            HAVING count(*) >= 2
        """,
        "line_dedupe": r"""
            WITH d AS (
              SELECT doc_id,
                     text || chr(10) || 'shared footer line for ' || source
                       AS text
              FROM documents
            ),
            l0 AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM d
            ),
            l1 AS (
              SELECT doc_id, unnest(range(0, len(ls))) AS line_no, ls
              FROM l0
            ),
            keyed AS (
              SELECT doc_id, line_no, ls[line_no + 1] AS line,
                     CASE WHEN len(string_split_regex(
                                    trim(ls[line_no + 1]), '\s+')) >= 3
                          THEN md5(trim(ls[line_no + 1])) END AS key
              FROM l1
            ),
            stats AS (
              SELECT key, count(*) AS n,
                     min(doc_id * 1000000000 + line_no) AS first_k
              FROM keyed WHERE key IS NOT NULL GROUP BY key
              HAVING count(*) >= 2
            ),
            marked AS (
              SELECT k.doc_id, k.line_no, k.line,
                     (s.key IS NULL
                      OR k.doc_id * 1000000000 + k.line_no = s.first_k)
                       AS keep
              FROM keyed k LEFT JOIN stats s ON k.key = s.key
            )
            SELECT doc_id,
                   coalesce(
                     string_agg(CASE WHEN keep THEN line END, chr(10)
                                ORDER BY line_no),
                     '') AS text,
                   sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT
                     AS n_lines_removed
            FROM marked GROUP BY doc_id
        """,
        "winnow_pairs": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g0 AS (
              SELECT doc_id, unnest(range(0, len(toks) - 5 + 1)) AS pos,
                     toks, len(toks) - 5 + 1 AS nh
              FROM d WHERE len(toks) >= 5 + 4 - 1
            ),
            g AS (
              SELECT doc_id, pos, nh,
                     md5(array_to_string(toks[pos + 1 : pos + 5], ' ')) AS h
              FROM g0
            ),
            wmin AS (
              SELECT doc_id, pos, nh,
                     min(h || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0'))
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS okey
              FROM g
            ),
            sel AS (
              SELECT DISTINCT doc_id, substr(okey, 1, 32) AS fp
              FROM wmin WHERE pos <= nh - 4
            ),
            ok AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 50)
            SELECT a.doc_id AS id_l, b.doc_id AS id_r,
                   count(*)::BIGINT AS n_shared
            FROM sel a JOIN ok USING (fp) JOIN sel b USING (fp)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        """,
        "cluster_thresholds": """
            WITH RECURSIVE
            d AS (SELECT doc_id, lang, source, n_chars FROM documents),
            e50 AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.n_chars = b.n_chars AND a.doc_id <> b.doc_id
            ),
            r50(u, v) AS (
              SELECT u, v FROM e50
              UNION
              SELECT r.u, e.v FROM r50 r JOIN e50 e ON r.v = e.u
            ),
            a50 AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM r50 GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            e1 AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND abs(a.n_chars - b.n_chars) <= 20
               AND a.doc_id <> b.doc_id
            ),
            r1(u, v) AS (
              SELECT u, v FROM e1
              UNION
              SELECT r.u, e.v FROM r1 r JOIN e1 e ON r.v = e.u
            ),
            a1 AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM r1 GROUP BY u
              ) m ON m.u = d.doc_id
            )
            SELECT CAST(50000000 AS BIGINT) AS threshold_micro,
                   record_id, component FROM a50
            UNION ALL
            SELECT CAST(1000000 AS BIGINT) AS threshold_micro,
                   record_id, component FROM a1
        """,
        "cluster_splits": """
            WITH RECURSIVE
            d AS (SELECT doc_id, lang, source FROM documents),
            e AS (
              SELECT a.doc_id AS u, b.doc_id AS v FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id <> b.doc_id
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            assign AS (
              SELECT d.doc_id AS record_id,
                     least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
              FROM d LEFT JOIN (
                SELECT u, min(v) AS mn FROM reach GROUP BY u
              ) m ON m.u = d.doc_id
            ),
            hashed AS (
              SELECT record_id, component,
                     ('0x' || substr(md5(component::VARCHAR || '|42'),
                                     1, 8))::BIGINT / 4294967296.0 AS u
              FROM assign
            )
            SELECT record_id, component,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM hashed
        """,
        "bigram_perplexity": _BIGRAM_PPL_ORACLE_SQL,
        "edit_distance_pairs": _EDIT_DISTANCE_ORACLE_SQL,
        "edit_distance_link": _EDIT_LINK_ORACLE_SQL,
        "split_leakage": _SPLIT_LEAKAGE_ORACLE_SQL,
        "line_langs": _line_langs_oracle_sql(),
        "temperature_sample": _TEMPERATURE_ORACLE_SQL,
        "chunk_documents": _CHUNK_ORACLE_SQL,
        "pack_sequences": _PACK_ORACLE_SQL,
        "date_match_level": _DATE_LEVEL_ORACLE_SQL,
        "perplexity": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS token
              FROM documents WHERE trim(text) <> ''
            ),
            counts AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
            tot AS (
              SELECT sum(n) AS total, count(*) AS vocab FROM counts
            ),
            lm AS (
              SELECT token,
                     ln((n + 1.0) / (total + 1.0 * (vocab + 1))) AS logp
              FROM counts CROSS JOIN tot
            ),
            sc AS (SELECT t.doc_id, lm.logp FROM tok t JOIN lm USING (token)),
            per AS (
              SELECT doc_id, count(*) AS n_tokens, -avg(logp) AS ce
              FROM sc GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
                   round(per.ce, 6) AS cross_entropy,
                   round(exp(per.ce), 6) AS perplexity
            FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        """,
        "domain_quota": """
            WITH ranked AS (
              SELECT doc_id AS record_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC,
                                md5(doc_id::VARCHAR || '|42') ASC
                     ) AS rn
              FROM documents
            )
            SELECT record_id, source, n_chars FROM ranked WHERE rn <= 5
        """,
        "token_budget": r"""
            WITH d AS (
              SELECT doc_id AS record_id, lang,
                     (CASE WHEN text IS NULL THEN NULL
                           WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+'))
                      END)::BIGINT AS n_tokens,
                     md5(doc_id::VARCHAR || '|42') AS rk
              FROM documents
            ),
            c AS (
              SELECT record_id, lang, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY rk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0)::BIGINT AS tokens_before
              FROM d
            )
            SELECT record_id, lang, n_tokens, tokens_before
            FROM c WHERE tokens_before < 500
        """,
        "histogram": """
            SELECT bin,
                   CAST(floor((0.0 + bin * 5000.0) * 1000000 + 0.5) AS BIGINT)
                     AS lo_micro,
                   CAST(floor((0.0 + (bin + 1) * 5000.0) * 1000000 + 0.5)
                        AS BIGINT) AS hi_micro,
                   count(*)::BIGINT AS n
            FROM (
              SELECT least(greatest(floor(
                       (CAST(l_extendedprice AS DOUBLE) - 0.0) / 5000.0
                     ), 0), 19)::INT AS bin
              FROM lineitem WHERE l_extendedprice IS NOT NULL
            )
            GROUP BY bin
        """,
        "gopher_rules": r"""
            WITH t AS (
              SELECT doc_id, text,
                list_filter(regexp_split_to_array(trim(text), '\s+'),
                            w -> w <> '') AS toks,
                list_filter(string_split(text, chr(10)),
                            l -> trim(l) <> '') AS lines
              FROM documents
            ),
            m AS (
              SELECT doc_id, text, toks, lines,
                len(toks) AS n_words,
                greatest(len(toks), 1)::DOUBLE AS safe_words,
                coalesce(list_sum(list_transform(toks, w -> length(w))), 0)
                  ::DOUBLE / greatest(len(toks), 1) AS mean_len,
                (length(text) - length(regexp_replace(text, '#', '', 'g'))
                 + len(regexp_split_to_array(text, '(\.\.\.|…)')) - 1
                )::DOUBLE / greatest(len(toks), 1) AS symbol_ratio,
                len(list_filter(lines,
                    l -> regexp_matches(trim(l), '^([\*•-])')))::DOUBLE
                  / greatest(len(lines), 1) AS bullet_frac,
                len(list_filter(lines,
                    l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::DOUBLE
                  / greatest(len(lines), 1) AS ellipsis_frac,
                len(list_filter(toks,
                    w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                  / greatest(len(toks), 1) AS alpha_frac,
                len(list_intersect(
                    list_distinct(list_transform(toks, w -> lower(w))),
                    ['the','be','to','of','and','that','have','with']
                )) AS stop_hits
              FROM t
            )
            SELECT doc_id,
              (n_words >= 20 AND n_words <= 100000) AS word_count_ok,
              (mean_len >= 3.5 AND mean_len <= 10.0) AS mean_word_len_ok,
              (symbol_ratio <= 0.1) AS symbol_ratio_ok,
              (bullet_frac <= 0.9) AS bullet_frac_ok,
              (ellipsis_frac <= 0.3) AS ellipsis_frac_ok,
              (alpha_frac >= 0.8) AS alpha_frac_ok,
              (stop_hits >= 2) AS stopwords_ok,
              ((n_words >= 20 AND n_words <= 100000)
               AND (mean_len >= 3.5 AND mean_len <= 10.0)
               AND (symbol_ratio <= 0.1)
               AND (bullet_frac <= 0.9)
               AND (ellipsis_frac <= 0.3)
               AND (alpha_frac >= 0.8)
               AND (stop_hits >= 2)) AS passes
            FROM m
        """,
        "quantize_embeddings": """
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                     list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> abs(x))) AS maxabs
              FROM embeddings
            )
            SELECT vec_id,
              CAST(floor((maxabs / 127.0) * 1e9 + 0.5) AS BIGINT)
                AS scale_nano,
              CASE WHEN maxabs = 0
                   THEN array_to_string(list_transform(e, x -> 0), ',')
                   ELSE array_to_string(list_transform(e,
                     x -> CAST(round(x / (maxabs / 127.0)) AS INT)), ',')
              END AS q
            FROM v
        """,
        "one_to_one_match": f"""
            WITH RECURSIVE d AS (
              SELECT doc_id, lang, source, substring(text, 1, 30) AS prefix
              FROM documents
            ),
            scored AS (
              SELECT a.doc_id AS l, b.doc_id AS r,
                     {_micro_sql('jaro_winkler_similarity(a.prefix, b.prefix)')} AS s
              FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                                AND a.doc_id < b.doc_id
            ),
            -- locally-dominant-edge rounds == sequential greedy matching
            -- under (s DESC, l, r) with ONE shared used-record set:
            -- dedupe semantics, so each edge is symmetrized via unnest
            -- into (node, edge) rows and ranked per NODE over both
            -- orientations; mirrors linker/assignment.py:_round_dedupe
            work(status, l, r, s) AS (
              SELECT 'rem', l, r, s FROM (
                SELECT l, r, s, row_number() OVER (
                         PARTITION BY l, r ORDER BY s DESC, l, r) AS prn
                FROM scored WHERE s IS NOT NULL AND l <> r
              ) WHERE prn = 1
              UNION ALL
              SELECT new_status, l, r, s FROM (
                SELECT l, r, s, node, dom,
                       CASE WHEN dom = 1 THEN 'dom'
                            WHEN any_used = 0 THEN 'rem'
                            ELSE NULL END AS new_status
                FROM (
                  SELECT l, r, s, node, dom,
                         max(node_used) OVER (PARTITION BY l, r) AS any_used
                  FROM (
                    SELECT l, r, s, node, dom,
                           max(dom) OVER (PARTITION BY node) AS node_used
                    FROM (
                      SELECT l, r, s, node,
                             CASE WHEN max(rn) OVER (PARTITION BY l, r) = 1
                                  THEN 1 ELSE 0 END AS dom
                      FROM (
                        SELECT w.l, w.r, w.s, u.node,
                               row_number() OVER (
                                 PARTITION BY u.node
                                 ORDER BY w.s DESC, w.l, w.r) AS rn
                        FROM work w, unnest([w.l, w.r]) AS u(node)
                        WHERE w.status = 'rem'
                      )
                    )
                  )
                )
              ) WHERE new_status IS NOT NULL AND node = l
            )
            SELECT l AS record_id_l, r AS record_id_r, s AS jw_micro
            FROM work WHERE status = 'dom'
        """,
        "mutual_best": f"""
            WITH d AS (
              SELECT doc_id, lang, source, substring(text, 1, 30) AS prefix
              FROM documents
            ),
            scored AS (
              SELECT a.doc_id AS l, b.doc_id AS r,
                     {_micro_sql('jaro_winkler_similarity(a.prefix, b.prefix)')} AS s
              FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                                AND a.doc_id < b.doc_id
            ),
            -- dedupe semantics: rank per NODE over both orientations
            -- (mirrors linker/assignment.py:mutual_best_links dedupe path)
            nodes AS (
              SELECT l AS node, l, r, s FROM scored WHERE s IS NOT NULL AND l <> r
              UNION ALL
              SELECT r AS node, l, r, s FROM scored WHERE s IS NOT NULL AND l <> r
            ),
            ranked AS (
              SELECT node, l, r, s,
                     row_number() OVER (
                       PARTITION BY node ORDER BY s DESC, l, r) AS rn
              FROM nodes
            )
            SELECT l AS record_id_l, r AS record_id_r, s AS jw_micro
            FROM ranked GROUP BY l, r, s HAVING max(rn) = 1
        """,
        "band_linker": """
            SELECT least(a.doc_id, b.doc_id) AS record_id_l,
                   greatest(a.doc_id, b.doc_id) AS record_id_r
            FROM documents a JOIN documents b
              ON a.source = b.source AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 3
        """,
        "canopy_assign": f"""
            {_mis_work_cte()}
            SELECT record_id, canopy FROM (
              SELECT r AS record_id, l AS canopy FROM loose_e
              WHERE l IN (SELECT c FROM centers)
              UNION
              SELECT l AS record_id, r AS canopy FROM loose_e
              WHERE r IN (SELECT c FROM centers)
              UNION
              SELECT c AS record_id, c AS canopy FROM centers
            )
        """,
        "pivot_clustering": f"""
            {_mis_work_cte()},
            member AS (
              SELECT v AS record_id, min(u) AS cluster
              FROM tight_sym WHERE u IN (SELECT c FROM centers)
              GROUP BY v
            )
            SELECT record_id, cluster FROM member
            WHERE record_id NOT IN (SELECT c FROM centers)
            UNION ALL
            SELECT c AS record_id, c AS cluster FROM centers
        """,
        "clk_dice_pairs": f"""
            WITH e AS (
              SELECT c_custkey, c_nationkey,
                list_sort(list_distinct(flatten(list_transform(
                  list_distinct(list_concat(
                    list_transform(range(1, length('_' || lower(trim(c_name)) || '_')), i -> substring('_' || lower(trim(c_name)) || '_', i, 2)),
                    list_transform(range(1, length('_' || lower(trim(c_mktsegment)) || '_')), i -> substring('_' || lower(trim(c_mktsegment)) || '_', i, 2))
                  )),
                  g -> [(('0x' || substr(md5(g || ':42:0'), 1, 8))::BIGINT
                          % 1024),
                        (('0x' || substr(md5(g || ':42:1'), 1, 8))::BIGINT
                          % 1024)]
                )))) AS pos
              FROM customer
            ),
            p AS (
              SELECT a.c_custkey AS custkey_l, b.c_custkey AS custkey_r,
                     2.0 * len(list_intersect(a.pos, b.pos))
                       / (len(a.pos) + len(b.pos)) AS dice
              FROM e a JOIN e b ON a.c_nationkey = b.c_nationkey
                                AND a.c_custkey < b.c_custkey
            )
            SELECT custkey_l, custkey_r,
                   {_micro_sql('dice')} AS dice_micro
            FROM p WHERE dice >= 0.85
        """,
        "center_clustering": f"""
            WITH RECURSIVE d AS MATERIALIZED (
              SELECT doc_id, lang, source, substring(text, 1, 30) AS prefix
              FROM documents
            ),
            scored AS MATERIALIZED (
              SELECT a.doc_id AS k1, b.doc_id AS k2,
                     {_micro_sql('jaro_winkler_similarity(a.prefix, b.prefix)')} AS s
              FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                                AND a.doc_id < b.doc_id
            ),
            -- decidable-edge rounds == the sequential CENTER scan in
            -- (s DESC, k1, k2) order; mirrors cluster/center.py exactly
            work(status, node, other, s, k1, k2,
                 st_n, ctr_n, st_o, ctr_o) AS (
              SELECT 'e', k1, k2, s, k1, k2,
                     0, NULL::BIGINT, 0, NULL::BIGINT
              FROM scored WHERE s IS NOT NULL
              UNION ALL
              SELECT 'e', k2, k1, s, k1, k2,
                     0, NULL::BIGINT, 0, NULL::BIGINT
              FROM scored WHERE s IS NOT NULL
              UNION ALL
              SELECT new_status, node, other, s, k1, k2,
                     CASE WHEN new_status = 'a' THEN NULL
                          WHEN node_upd IS NOT NULL
                          THEN CAST(node_upd // 1099511627776 AS INT)
                          ELSE st_n END,
                     CASE WHEN new_status = 'a' THEN upd % 1099511627776 - 1
                          WHEN node_upd IS NOT NULL THEN node_upd % 1099511627776 - 1
                          ELSE ctr_n END,
                     CASE WHEN other_upd > 0
                          THEN CAST(other_upd // 1099511627776 AS INT) ELSE st_o END,
                     CASE WHEN other_upd > 0
                          THEN other_upd % 1099511627776 - 1 ELSE ctr_o END
              FROM (
                SELECT *,
                       CASE WHEN rn = 1 AND upd IS NOT NULL THEN 'a'
                            WHEN decid = 0 THEN 'e'
                            ELSE NULL END AS new_status,
                       sum(coalesce(node_upd, 0))
                         OVER (PARTITION BY k1, k2)
                         - coalesce(node_upd, 0) AS other_upd
                FROM (
                  SELECT *, max(upd) OVER (PARTITION BY node) AS node_upd
                  FROM (
                    SELECT *,
                           CASE WHEN rn = 1 AND decid = 1 AND st_n = 0 THEN
                             CASE WHEN st_o = 0 THEN
                                    CASE WHEN node < other
                                         THEN 1 * 1099511627776::BIGINT + node + 1
                                         ELSE 2 * 1099511627776::BIGINT + other + 1 END
                                  WHEN st_o = 1
                                  THEN 2 * 1099511627776::BIGINT + other + 1
                                  ELSE NULL END
                           END AS upd
                    FROM (
                      SELECT *,
                             min(CASE WHEN st_n <> 0 OR rn = 1
                                      THEN 1 ELSE 0 END)
                               OVER (PARTITION BY k1, k2) AS decid
                      FROM (
                        SELECT *, row_number() OVER (
                          PARTITION BY node ORDER BY s DESC, k1, k2) AS rn
                        FROM work WHERE status = 'e'
                      )
                    )
                  )
                )
              ) WHERE new_status IS NOT NULL
            ),
            assigned AS (SELECT node AS record_id, ctr_n AS cluster
                         FROM work WHERE status = 'a')
            SELECT d.doc_id AS record_id,
                   coalesce(a.cluster, d.doc_id) AS cluster
            FROM d LEFT JOIN assigned a ON d.doc_id = a.record_id
        """,
        "best_match_filter": f"""
            WITH pairs AS ({pair_block}),
            labelled AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN n_chars_l = n_chars_r THEN 0
                          WHEN abs(n_chars_l - n_chars_r) <= 20 THEN 1
                          ELSE 2 END AS len_cmp
              FROM pairs
            ),
            odds_t AS (
              SELECT *, CASE len_cmp
                          WHEN 0 THEN 0.6 / 0.01
                          WHEN 1 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS raw_odds
              FROM labelled
            ),
            winmax AS (
              SELECT *, max(raw_odds) OVER (PARTITION BY record_id_r) AS mx
              FROM odds_t
            )
            SELECT record_id_l, record_id_r,
                   CAST(floor(raw_odds * 1000000 + 0.5) AS BIGINT)
                     AS odds_micro
            FROM winmax WHERE raw_odds = mx
        """,
        "fs_score": f"""
            WITH pairs AS ({pair_block}),
            labelled AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN n_chars_l = n_chars_r THEN 0
                          WHEN abs(n_chars_l - n_chars_r) <= 20 THEN 1
                          ELSE 2 END AS len_cmp
              FROM pairs
            ),
            odds_t AS (
              SELECT *, CASE len_cmp
                          WHEN 0 THEN 0.6 / 0.01
                          WHEN 1 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS raw_odds
              FROM labelled
            )
            SELECT record_id_l, record_id_r, len_cmp::BIGINT AS len_cmp,
                   round(raw_odds, 6) AS odds,
                   round(raw_odds / (1 + raw_odds), 6) AS match_probability
            FROM odds_t
        """,
        "fs_score_tf": """
            WITH stats AS (
              SELECT n_chars AS v,
                     count(*)::DOUBLE / (SELECT count(*) FROM documents)
                       AS f
              FROM documents GROUP BY n_chars
            ),
            d AS (
              SELECT doc_id, lang, source, n_chars, f AS nf
              FROM documents JOIN stats ON n_chars = v
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.n_chars AS ncl, b.n_chars AS ncr,
                     greatest(a.nf, b.nf) AS freq
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
            ),
            labelled AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN ncl = ncr THEN 0
                          WHEN abs(ncl - ncr) <= 20 THEN 1
                          ELSE 2 END AS len_cmp,
                     freq
              FROM pairs
            ),
            odds_t AS (
              SELECT *, CASE len_cmp
                          WHEN 0 THEN (0.6 / 0.01)
                               * pow(0.01 / greatest(freq, 0.000001), 1.0)
                          WHEN 1 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS raw_odds
              FROM labelled
            )
            SELECT record_id_l, record_id_r, len_cmp::BIGINT AS len_cmp,
                   round(raw_odds, 6) AS odds,
                   round(raw_odds / (1 + raw_odds), 6) AS match_probability
            FROM odds_t
        """,
        "score_waterfall": f"""
            WITH pairs AS ({pair_block}),
            labelled AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN n_chars_l = n_chars_r THEN 0
                          WHEN abs(n_chars_l - n_chars_r) <= 20 THEN 1
                          ELSE 2 END AS len_cmp
              FROM pairs
            ),
            odds_t AS (
              SELECT *, CASE len_cmp
                          WHEN 0 THEN 0.6 / 0.01
                          WHEN 1 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS raw_odds
              FROM labelled
            )
            SELECT record_id_l, record_id_r, 'len_cmp' AS dimension,
                   len_cmp::BIGINT AS level,
                   round(raw_odds, 6) AS odds,
                   round(log2(raw_odds), 6) AS log2_bf
            FROM odds_t
            UNION ALL
            SELECT record_id_l, record_id_r, 'total' AS dimension,
                   NULL::BIGINT AS level,
                   round(raw_odds, 6) AS odds,
                   round(log2(raw_odds), 6) AS log2_bf
            FROM odds_t
        """,
        "label_sample": f"""
            WITH pairs AS ({pair_block}),
            labelled AS (
              SELECT record_id_l, record_id_r,
                     CASE WHEN n_chars_l = n_chars_r THEN 0
                          WHEN abs(n_chars_l - n_chars_r) <= 20 THEN 1
                          ELSE 2 END AS len_cmp
              FROM pairs
            ),
            odds_t AS (
              SELECT *, CASE len_cmp
                          WHEN 0 THEN 0.6 / 0.01
                          WHEN 1 THEN 0.3 / 0.09
                          ELSE 0.1 / 0.9 END AS raw_odds
              FROM labelled
            ),
            banded AS (
              SELECT record_id_l, record_id_r,
                     raw_odds / (1 + raw_odds) AS p,
                     least(CAST(floor((raw_odds / (1 + raw_odds)) * 5)
                                AS INT), 4) AS band,
                     md5(record_id_l::VARCHAR || '|'
                         || record_id_r::VARCHAR || '|42') AS rk
              FROM odds_t
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY band ORDER BY rk
              ) AS rank
              FROM banded
            )
            SELECT record_id_l, record_id_r, band::BIGINT AS band,
                   rank::BIGINT AS rank,
                   round(p, 6) AS match_probability
            FROM ranked WHERE rank <= 10
        """,
        "token_counts": f"""
            SELECT doc_id AS record_id,
                   CASE WHEN text IS NULL THEN NULL
                        WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END::BIGINT AS n_tokens
            FROM documents
        """,
        "lang_id": f"""
            WITH scored AS (
              SELECT {_lang_markers_sql(_EN)} AS s_en,
                     {_lang_markers_sql(_ES)} AS s_es,
                     {_lang_markers_sql(_DE)} AS s_de,
                     {_lang_markers_sql(_FR)} AS s_fr
              FROM documents
            ),
            guessed AS (
              SELECT CASE
                       WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'und'
                       WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                       WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                       WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                       WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
                       ELSE 'und' END AS lang_guess
              FROM scored
            )
            SELECT lang_guess, count(*)::BIGINT AS n FROM guessed GROUP BY lang_guess
        """,
        "quality": f"""
            WITH parts AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks,
                     length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS punct,
                     length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper_c,
                     {_lang_markers_sql(_EN)} AS stop_hits
              FROM documents
            )
            SELECT doc_id AS record_id,
                   round(
                     (CASE WHEN n_chars::DOUBLE / greatest(n_toks, 1) BETWEEN 3.0 AND 12.0
                           THEN 1.0 ELSE 0.0 END) * 0.3
                   + (CASE WHEN punct::DOUBLE / greatest(n_chars, 1) <= 0.2
                           THEN 1.0 ELSE 0.0 END) * 0.2
                   + (CASE WHEN upper_c::DOUBLE / greatest(n_chars, 1) <= 0.3
                           THEN 1.0 ELSE 0.0 END) * 0.2
                   + least(stop_hits / 3.0, 1.0) * 0.3
                   , 6) AS quality
            FROM parts
        """,
        "fingerprints": """
            SELECT doc_id AS record_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "exact_dup_groups": """
            SELECT md5(props) AS fp, count(*)::BIGINT AS n_dups
            FROM events GROUP BY md5(props) HAVING count(*) >= 2
        """,
        "tfidf_idf": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
            ),
            df AS (
              SELECT term, count(DISTINCT doc_id) AS n FROM toks GROUP BY term
            )
            SELECT term,
                   round(ln((SELECT count(*) FROM documents)::DOUBLE / n), 6) AS idf
            FROM df
        """,
        "rare_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
            )
            SELECT term FROM toks GROUP BY term HAVING count(DISTINCT doc_id) <= 2
        """,
        "jaccard_pairs": f"""
            WITH d AS (
              SELECT doc_id, source, {_TOKENS} AS tokens FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.tokens AS tl, b.tokens AS tr
              FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   round(
                     CASE WHEN len(list_intersect(tl, tr)) = 0 THEN 0.0
                          ELSE len(list_intersect(tl, tr))::DOUBLE
                               / len(list_distinct(list_concat(tl, tr)))
                     END, 6) AS jaccard_sim
            FROM pairs
            WHERE round(
                     CASE WHEN len(list_intersect(tl, tr)) = 0 THEN 0.0
                          ELSE len(list_intersect(tl, tr))::DOUBLE
                               / len(list_distinct(list_concat(tl, tr)))
                     END, 6) >= 0.05
        """,
        "levenshtein_ratio": """
            WITH d AS (
              SELECT doc_id, lang, source, substring(text, 1, 40) AS prefix
              FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     a.prefix AS pl, b.prefix AS pr
              FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                                AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   round(
                     (greatest(length(pl), length(pr)) - levenshtein(pl, pr))::DOUBLE
                     / greatest(length(pl), length(pr)), 6) AS lev_ratio
            FROM pairs
        """,
        "jaro_winkler": """
            WITH d AS (
              SELECT doc_id, lang, source, substring(text, 1, 30) AS prefix
              FROM documents
            )
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                   round(jaro_winkler_similarity(a.prefix, b.prefix), 6) AS jw
            FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
                              AND a.doc_id < b.doc_id
        """,
        "cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8
            ),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbour_id,
                     list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS cosine
              FROM q, embeddings c
              WHERE c.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbour_id ASC
              ) AS rn
              FROM scored
            )
            SELECT query_id, neighbour_id, round(cosine, 6) AS cosine
            FROM ranked WHERE rn <= 5
        """,
        "embedding_outliers": """
            WITH a AS (
              SELECT vec_id AS record_id, vec_id % 40 AS component,
                     embedding::DOUBLE[] AS v
              FROM embeddings
            ),
            dims AS (
              SELECT component, unnest(range(0, len(v))) AS d, v FROM a
            ),
            dv AS (SELECT component, d, v[d + 1] AS x FROM dims),
            per_dim AS (
              SELECT component, d, avg(x) AS m, count(*) AS n
              FROM dv GROUP BY 1, 2
            ),
            cents AS (
              SELECT component, list(m ORDER BY d) AS centroid
              FROM per_dim GROUP BY component HAVING max(n) >= 2
            )
            SELECT a.record_id, a.component,
                   round(list_cosine_similarity(a.v, c.centroid), 6)
                     AS cosine_to_centroid
            FROM a JOIN cents c USING (component)
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                      x -> x * x))), 6) AS l2_norm
            FROM embeddings
        """,
        "surt": _SURT_ORACLE_SQL,
        "blocklist_filter": _BLOCKLIST_ORACLE_SQL,
        "clean_url": r"""
            WITH raw AS (
              SELECT c_custkey,
                (CASE WHEN c_custkey % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END)
                || (CASE WHEN c_custkey % 5 = 0 THEN 'WWW.' ELSE '' END)
                || 'shop' || (c_custkey % 7)::VARCHAR
                || '.Example' || (c_custkey % 3)::VARCHAR || '.COM'
                || (CASE WHEN c_custkey % 4 = 0 AND c_custkey % 2 = 0 THEN ':443'
                         WHEN c_custkey % 4 = 1 THEN ':8080' ELSE '' END)
                || '/p/' || (c_custkey % 97)::VARCHAR
                || '?utm_source=x&b=' || (c_custkey % 13)::VARCHAR
                || '&a=' || (c_custkey % 11)::VARCHAR
                || (CASE WHEN c_custkey % 6 = 0 THEN '&ref=feed' ELSE '' END)
                || (CASE WHEN c_custkey % 8 = 0 THEN '#s' ELSE '' END) AS url
              FROM customer
            ),
            p AS (
              SELECT c_custkey,
                lower(coalesce(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1), '')) AS scheme,
                coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$', 1), '') AS rest
              FROM raw
            ),
            q AS (
              SELECT c_custkey, scheme,
                lower(coalesce(regexp_extract(rest, '^([^/?#]*)', 1), '')) AS hostport,
                coalesce(regexp_extract(rest, '^[^/?#]*([^?#]*)', 1), '') AS path0,
                coalesce(regexp_extract(rest, '\?([^#]*)', 1), '') AS query0
              FROM p
            ),
            r AS (
              SELECT c_custkey, scheme,
                coalesce(regexp_extract(hostport, '^([^:]*)', 1), '') AS host,
                nullif(coalesce(regexp_extract(hostport, ':(\d+)$', 1), ''), '') AS port,
                CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                coalesce(array_to_string(
                  list_sort(list_filter(string_split(query0, '&'),
                    x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
                  '&'), '') AS canq
              FROM q
            )
            SELECT c_custkey,
              scheme || '://'
              || (CASE WHEN port IS NULL
                        OR (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                  THEN host ELSE host || ':' || port END)
              || path
              || (CASE WHEN canq = '' THEN '' ELSE '?' || canq END) AS url_clean,
              nullif(coalesce(regexp_extract(regexp_replace(host, '^www\.', ''),
                                             '([^.]+\.[^.]+)$', 1), ''), '') AS domain
            FROM r
        """,
        "url_match_level": r"""
            WITH pairs AS (
              SELECT c_custkey,
                'https://a.example' || (c_custkey % 5)::VARCHAR || '.com/p/'
                  || (c_custkey % 17)::VARCHAR || '?q=' || (c_custkey % 7)::VARCHAR
                  || '&utm_x=1' AS u1,
                CASE
                  WHEN c_custkey % 4 = 0 THEN
                    'HTTPS://A.example' || (c_custkey % 5)::VARCHAR || '.COM/p/'
                    || (c_custkey % 17)::VARCHAR || '?q=' || (c_custkey % 7)::VARCHAR
                  WHEN c_custkey % 4 = 1 THEN
                    'https://a.example' || (c_custkey % 5)::VARCHAR || '.com/p/'
                    || (c_custkey % 17)::VARCHAR || '?q=' || ((c_custkey % 7) + 1)::VARCHAR
                  WHEN c_custkey % 4 = 2 THEN
                    'https://b.example' || (c_custkey % 5)::VARCHAR || '.com/z/'
                    || (c_custkey % 17)::VARCHAR
                  ELSE
                    'https://a.example' || (c_custkey % 5)::VARCHAR || '.net/p/'
                    || (c_custkey % 17)::VARCHAR
                END AS u2
              FROM customer
            ),
            long AS (
              SELECT c_custkey, 'l' AS side, u1 AS url FROM pairs
              UNION ALL
              SELECT c_custkey, 'r', u2 FROM pairs
            ),
            p AS (
              SELECT c_custkey, side,
                lower(coalesce(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1), '')) AS scheme,
                coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$', 1), '') AS rest
              FROM long
            ),
            q AS (
              SELECT c_custkey, side, scheme,
                lower(coalesce(regexp_extract(rest, '^([^/?#]*)', 1), '')) AS hostport,
                coalesce(regexp_extract(rest, '^[^/?#]*([^?#]*)', 1), '') AS path0,
                coalesce(regexp_extract(rest, '\?([^#]*)', 1), '') AS query0
              FROM p
            ),
            r AS (
              SELECT c_custkey, side, scheme,
                coalesce(regexp_extract(hostport, '^([^:]*)', 1), '') AS host,
                nullif(coalesce(regexp_extract(hostport, ':(\d+)$', 1), ''), '') AS port,
                CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                coalesce(array_to_string(
                  list_sort(list_filter(string_split(query0, '&'),
                    x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
                  '&'), '') AS canq
              FROM q
            ),
            c AS (
              SELECT c_custkey, side, host, path,
                scheme || '://'
                || (CASE WHEN port IS NULL
                          OR (scheme = 'http' AND port = '80')
                          OR (scheme = 'https' AND port = '443')
                    THEN host ELSE host || ':' || port END)
                || path
                || (CASE WHEN canq = '' THEN '' ELSE '?' || canq END) AS clean,
                coalesce(regexp_extract(regexp_replace(host, '^www\.', ''),
                                        '([^.]+\.[^.]+)$', 1), '') AS dom
              FROM r
            ),
            piv AS (
              SELECT c_custkey,
                max(CASE WHEN side = 'l' THEN clean END) AS clean_l,
                max(CASE WHEN side = 'r' THEN clean END) AS clean_r,
                max(CASE WHEN side = 'l' THEN host END) AS host_l,
                max(CASE WHEN side = 'r' THEN host END) AS host_r,
                max(CASE WHEN side = 'l' THEN path END) AS path_l,
                max(CASE WHEN side = 'r' THEN path END) AS path_r,
                max(CASE WHEN side = 'l' THEN dom END) AS dom_l,
                max(CASE WHEN side = 'r' THEN dom END) AS dom_r
              FROM c GROUP BY c_custkey
            )
            SELECT c_custkey,
              (CASE WHEN clean_l = clean_r THEN 0
                    WHEN host_l = host_r AND path_l = path_r THEN 1
                    WHEN dom_l <> '' AND dom_l = dom_r THEN 2
                    ELSE 3 END)::INT AS lvl
            FROM piv
        """,
        "blocking_rule_stats": """
            WITH labels AS MATERIALIZED (
              SELECT
                (a.lang IS NOT NULL AND b.lang IS NOT NULL
                 AND a.lang = b.lang AND a.source IS NOT NULL
                 AND b.source IS NOT NULL AND a.source = b.source)
                  AS cov_langsrc,
                (a.n_chars IS NOT NULL AND b.n_chars IS NOT NULL
                 AND a.n_chars = b.n_chars) AS cov_nchars,
                (substr(a.text, 1, 20) IS NOT NULL
                 AND substr(b.text, 1, 20) IS NOT NULL
                 AND substr(a.text, 1, 20) = substr(b.text, 1, 20))
                  AS cov_fp20,
                (a.n_chars IS NOT NULL AND b.n_chars IS NOT NULL
                 AND (a.n_chars // 100) = (b.n_chars // 100))
                  AS cov_lenbin
              FROM documents a JOIN documents b
                ON substr(a.text, 1, 50) = substr(b.text, 1, 50)
               AND a.doc_id < b.doc_id
            ),
            costs AS MATERIALIZED (
              SELECT 'fp20' AS rule,
                     COALESCE(SUM(n * (n - 1) // 2), 0) AS est_pairs
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE substr(text, 1, 20) IS NOT NULL
                    GROUP BY substr(text, 1, 20))
              UNION ALL
              SELECT 'langsrc', COALESCE(SUM(n * (n - 1) // 2), 0)
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE lang IS NOT NULL AND source IS NOT NULL
                    GROUP BY lang, source)
              UNION ALL
              SELECT 'lenbin', COALESCE(SUM(n * (n - 1) // 2), 0)
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE n_chars IS NOT NULL GROUP BY n_chars // 100)
              UNION ALL
              SELECT 'nchars', COALESCE(SUM(n * (n - 1) // 2), 0)
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE n_chars IS NOT NULL GROUP BY n_chars)
            ),
            counts AS (
              SELECT COUNT(*) AS n_labels,
                     COALESCE(SUM(cov_fp20::INT), 0) AS c_fp20,
                     COALESCE(SUM(cov_langsrc::INT), 0) AS c_langsrc,
                     COALESCE(SUM(cov_lenbin::INT), 0) AS c_lenbin,
                     COALESCE(SUM(cov_nchars::INT), 0) AS c_nchars
              FROM labels
            ),
            unp AS (
              SELECT 'fp20' AS rule, c_fp20 AS covered, n_labels FROM counts
              UNION ALL
              SELECT 'langsrc', c_langsrc, n_labels FROM counts
              UNION ALL
              SELECT 'lenbin', c_lenbin, n_labels FROM counts
              UNION ALL
              SELECT 'nchars', c_nchars, n_labels FROM counts
            )
            SELECT u.rule, u.covered::BIGINT AS covered,
                   u.n_labels::BIGINT AS n_labels,
                   CASE WHEN (CASE WHEN u.n_labels = 0 THEN 0.0 ELSE u.covered::DOUBLE / u.n_labels END) IS NULL THEN NULL WHEN isnan(CASE WHEN u.n_labels = 0 THEN 0.0 ELSE u.covered::DOUBLE / u.n_labels END) THEN -1000000001 WHEN (CASE WHEN u.n_labels = 0 THEN 0.0 ELSE u.covered::DOUBLE / u.n_labels END) >= 1e12 THEN 1000000002 WHEN (CASE WHEN u.n_labels = 0 THEN 0.0 ELSE u.covered::DOUBLE / u.n_labels END) <= -1e12 THEN -1000000002 ELSE CAST(floor((CASE WHEN u.n_labels = 0 THEN 0.0 ELSE u.covered::DOUBLE / u.n_labels END) * 1000000 + 0.5) AS BIGINT) END
                     AS recall_micro,
                   c.est_pairs::BIGINT AS est_pairs
            FROM unp u JOIN costs c ON u.rule = c.rule
        """,
        "blocking_rule_greedy": """
            WITH labels AS MATERIALIZED (
              SELECT
                (a.lang IS NOT NULL AND b.lang IS NOT NULL
                 AND a.lang = b.lang AND a.source IS NOT NULL
                 AND b.source IS NOT NULL AND a.source = b.source)
                  AS cov_langsrc,
                (a.n_chars IS NOT NULL AND b.n_chars IS NOT NULL
                 AND a.n_chars = b.n_chars) AS cov_nchars,
                (substr(a.text, 1, 20) IS NOT NULL
                 AND substr(b.text, 1, 20) IS NOT NULL
                 AND substr(a.text, 1, 20) = substr(b.text, 1, 20))
                  AS cov_fp20,
                (a.n_chars IS NOT NULL AND b.n_chars IS NOT NULL
                 AND (a.n_chars // 100) = (b.n_chars // 100))
                  AS cov_lenbin
              FROM documents a JOIN documents b
                ON substr(a.text, 1, 50) = substr(b.text, 1, 50)
               AND a.doc_id < b.doc_id
            ),
            costs AS MATERIALIZED (
              SELECT 'langsrc' AS rule, COALESCE(SUM(n * (n - 1) // 2), 0) AS est_pairs
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE lang IS NOT NULL AND source IS NOT NULL
                    GROUP BY lang, source)
              UNION ALL
              SELECT 'lenbin', COALESCE(SUM(n * (n - 1) // 2), 0)
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE n_chars IS NOT NULL GROUP BY n_chars // 100)
              UNION ALL
              SELECT 'nchars', COALESCE(SUM(n * (n - 1) // 2), 0)
              FROM (SELECT COUNT(*) AS n FROM documents
                    WHERE n_chars IS NOT NULL GROUP BY n_chars)
            ),
            c1 AS (
              SELECT * FROM (
                SELECT 'langsrc' AS rule,
                       COALESCE(SUM(cov_langsrc::INT), 0) AS cov FROM labels
                UNION ALL
                SELECT 'lenbin', COALESCE(SUM(cov_lenbin::INT), 0) FROM labels
                UNION ALL
                SELECT 'nchars', COALESCE(SUM(cov_nchars::INT), 0) FROM labels
              )
            ),
            p1 AS (
              SELECT c.rule, c.cov FROM c1 c
              JOIN costs ON c.rule = costs.rule
              WHERE c.cov > 0
              ORDER BY c.cov DESC, costs.est_pairs ASC, c.rule ASC
              LIMIT 1
            ),
            u1 AS (
              SELECT * FROM labels
              WHERE NOT COALESCE(
                CASE (SELECT rule FROM p1)
                  WHEN 'langsrc' THEN cov_langsrc
                  WHEN 'lenbin' THEN cov_lenbin
                  WHEN 'nchars' THEN cov_nchars
                END, FALSE)
            ),
            c2 AS (
              SELECT * FROM (
                SELECT 'langsrc' AS rule,
                       COALESCE(SUM(cov_langsrc::INT), 0) AS cov FROM u1
                UNION ALL
                SELECT 'lenbin', COALESCE(SUM(cov_lenbin::INT), 0) FROM u1
                UNION ALL
                SELECT 'nchars', COALESCE(SUM(cov_nchars::INT), 0) FROM u1
              )
              WHERE rule NOT IN (SELECT rule FROM p1)
            ),
            p2 AS (
              SELECT c.rule, c.cov FROM c2 c
              JOIN costs ON c.rule = costs.rule
              WHERE c.cov > 0
              ORDER BY c.cov DESC, costs.est_pairs ASC, c.rule ASC
              LIMIT 1
            ),
            u2 AS (
              SELECT * FROM u1
              WHERE NOT COALESCE(
                CASE (SELECT rule FROM p2)
                  WHEN 'langsrc' THEN cov_langsrc
                  WHEN 'lenbin' THEN cov_lenbin
                  WHEN 'nchars' THEN cov_nchars
                END, FALSE)
            ),
            c3 AS (
              SELECT * FROM (
                SELECT 'langsrc' AS rule,
                       COALESCE(SUM(cov_langsrc::INT), 0) AS cov FROM u2
                UNION ALL
                SELECT 'lenbin', COALESCE(SUM(cov_lenbin::INT), 0) FROM u2
                UNION ALL
                SELECT 'nchars', COALESCE(SUM(cov_nchars::INT), 0) FROM u2
              )
              WHERE rule NOT IN (SELECT rule FROM p1 UNION ALL SELECT rule FROM p2)
            ),
            p3 AS (
              SELECT c.rule, c.cov FROM c3 c
              JOIN costs ON c.rule = costs.rule
              WHERE c.cov > 0
              ORDER BY c.cov DESC, costs.est_pairs ASC, c.rule ASC
              LIMIT 1
            ),
            steps AS (
              SELECT 1 AS step, rule, cov FROM p1
              UNION ALL SELECT 2, rule, cov FROM p2
              UNION ALL SELECT 3, rule, cov FROM p3
            )
            SELECT s.step::BIGINT AS step, s.rule,
                   s.cov::BIGINT AS new_covered,
                   (SUM(s.cov) OVER (ORDER BY s.step))::BIGINT AS cum_covered,
                   c.est_pairs::BIGINT AS est_pairs
            FROM steps s JOIN costs c ON s.rule = c.rule
        """,
        "time_window_link": """
            SELECT least(a.event_id, b.event_id)::BIGINT AS record_id_l,
                   greatest(a.event_id, b.event_id)::BIGINT AS record_id_r
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600 * 1000000
             AND a.event_id < b.event_id
        """,
        "sessionize": """
            SELECT event_id, user_id,
              sum(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 7200 SECONDS
                   THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM (
              SELECT event_id, user_id, ts,
                     lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_ts
              FROM events
            )
        """,
        "session_stats": """
            WITH lagged AS (
              SELECT user_id, ts, value,
                     lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_ts
              FROM events
            ),
            marked AS (
              -- session_window merges only STRICTLY overlapping
              -- [ts, ts+gap) windows: a gap exactly equal to 2h starts
              -- a new session (>=), unlike sessionize's strict >
              SELECT user_id, ts, value,
                sum(CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts >= INTERVAL 7200 SECONDS
                     THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
              FROM lagged
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 2 HOUR AS session_end,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM marked
            GROUP BY user_id, sid
        """,
        "strings_norm": r"""
            SELECT c_custkey,
              trim(regexp_replace(strip_accents(
                '  ' || translate(c_name, 'aeiou', 'áéíôü') || ' ' || chr(9)
                || ' ' || c_mktsegment || '  '), '\s+', ' ', 'g')) AS normed
            FROM customer
        """,
        "keep_latest": """
            SELECT user_id, event_id, ts FROM (
              SELECT user_id, event_id, ts,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                     ) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "profile_numeric": """
            WITH p AS (
              SELECT 'l_quantity' AS col, count(l_quantity)::BIGINT AS n,
                sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
                count(DISTINCT CAST(l_quantity AS DOUBLE))::BIGINT AS n_distinct,
                min(CAST(l_quantity AS DOUBLE)) AS mn,
                max(CAST(l_quantity AS DOUBLE)) AS mx,
                avg(CAST(l_quantity AS DOUBLE)) AS mean,
                quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS p50,
                quantile_cont(CAST(l_quantity AS DOUBLE), 0.95) AS p95
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', count(l_extendedprice)::BIGINT,
                sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
                count(DISTINCT CAST(l_extendedprice AS DOUBLE))::BIGINT,
                min(CAST(l_extendedprice AS DOUBLE)),
                max(CAST(l_extendedprice AS DOUBLE)),
                avg(CAST(l_extendedprice AS DOUBLE)),
                quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5),
                quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95)
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', count(l_discount)::BIGINT,
                sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT,
                count(DISTINCT CAST(l_discount AS DOUBLE))::BIGINT,
                min(CAST(l_discount AS DOUBLE)),
                max(CAST(l_discount AS DOUBLE)),
                avg(CAST(l_discount AS DOUBLE)),
                quantile_cont(CAST(l_discount AS DOUBLE), 0.5),
                quantile_cont(CAST(l_discount AS DOUBLE), 0.95)
              FROM lineitem
            )
            SELECT col AS "column", n, n_null, n_distinct,
                   round(mn, 6) AS min, round(mx, 6) AS max,
                   round(mean, 6) AS mean, round(p50, 6) AS p50,
                   round(p95, 6) AS p95
            FROM p
        """,
        "c4_clean": r"""
            WITH raw AS (
              SELECT doc_id,
                'Doc ' || doc_id::VARCHAR || ' says: ' || substr(text, 1, 40)
                || '.' || chr(10)
                || (CASE WHEN doc_id % 3 = 0
                         THEN 'Please enable javascript to continue.'
                         ELSE 'Another valid sentence right here.' END)
                || chr(10)
                || (CASE WHEN doc_id % 4 = 0 THEN 'Short.'
                         ELSE 'Is this a question?' END) AS t
              FROM documents
            )
            SELECT doc_id,
              coalesce(array_to_string(list_filter(string_split(t, chr(10)),
                l -> regexp_matches(l, '[.!?"]\s*$')
                 AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
                 AND NOT regexp_matches(l,
                   '(?i)(javascript|cookie|terms of use|privacy policy)')
              ), chr(10)), '') AS cleaned
            FROM raw
        """,
        "redact_pii": r"""
            WITH raw AS (
              SELECT c_custkey,
                'Contact user' || c_custkey::VARCHAR
                || '@mail' || (c_custkey % 5)::VARCHAR
                || '.example.com or +1 555-'
                || lpad((c_custkey % 10000)::VARCHAR, 4, '0')
                || ' at 10.' || (c_custkey % 200)::VARCHAR
                || '.0.1 today.' AS t
              FROM customer
            )
            SELECT c_custkey,
              regexp_replace(
                regexp_replace(
                  regexp_replace(t,
                    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                  '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                '\+?\d[\d\-() ]{7,}\d', '<PHONE>', 'g') AS redacted
            FROM raw
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5('42' || chr(31)
                        || CAST(doc_id AS VARCHAR) || chr(31) || lang),
                        1, 8))::UBIGINT AS DOUBLE) / 4294967296.0
                  < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
                              WHEN 'fr' THEN 0.1 ELSE 0.0 END
        """,
        "line_repetition": r"""
            WITH lines AS (
              SELECT doc_id, l, length(l) AS len
              FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                    FROM documents WHERE text IS NOT NULL)
              WHERE trim(l) <> ''
            ),
            per_line AS (
              SELECT doc_id, l, count(*) AS c, max(len) AS len
              FROM lines GROUP BY doc_id, l
            ),
            agg AS (
              SELECT doc_id,
                sum(c) AS n_lines, count(*) AS n_distinct,
                sum((c - 1) * len) AS dup_chars, sum(c * len) AS tot_chars
              FROM per_line GROUP BY doc_id
            )
            SELECT d.doc_id,
              CASE WHEN d.text IS NULL THEN NULL
                   WHEN a.doc_id IS NULL THEN 0.0
                   ELSE round((n_lines - n_distinct) / n_lines::DOUBLE, 9)
              END AS dup_line_frac,
              CASE WHEN d.text IS NULL THEN NULL
                   WHEN a.doc_id IS NULL OR tot_chars = 0 THEN 0.0
                   ELSE round(dup_chars / tot_chars::DOUBLE, 9)
              END AS dup_line_char_frac
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "paragraph_repetition": r"""
            WITH segs AS (
              SELECT doc_id, kind, s, length(s) AS len
              FROM (
                SELECT doc_id, 'line' AS kind,
                       unnest(string_split(text, chr(10))) AS s
                FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT doc_id, 'para' AS kind,
                       unnest(string_split(text, chr(10) || chr(10))) AS s
                FROM documents WHERE text IS NOT NULL
              )
              WHERE trim(s) <> ''
            ),
            per_seg AS (
              SELECT doc_id, kind, s, count(*) AS c, max(len) AS len
              FROM segs GROUP BY doc_id, kind, s
            ),
            agg AS (
              SELECT doc_id, kind,
                sum(c) AS n_segs, count(*) AS n_distinct,
                sum((c - 1) * len) AS dup_chars, sum(c * len) AS tot_chars
              FROM per_seg GROUP BY doc_id, kind
            ),
            pv AS (
              SELECT doc_id,
                max(CASE WHEN kind = 'line' THEN
                  round((n_segs - n_distinct) / n_segs::DOUBLE, 9) END) AS lf,
                max(CASE WHEN kind = 'line' AND tot_chars > 0 THEN
                  round(dup_chars / tot_chars::DOUBLE, 9)
                  WHEN kind = 'line' THEN 0.0 END) AS lcf,
                max(CASE WHEN kind = 'para' THEN
                  round((n_segs - n_distinct) / n_segs::DOUBLE, 9) END) AS pf,
                max(CASE WHEN kind = 'para' AND tot_chars > 0 THEN
                  round(dup_chars / tot_chars::DOUBLE, 9)
                  WHEN kind = 'para' THEN 0.0 END) AS pcf
              FROM agg GROUP BY doc_id
            )
            SELECT d.doc_id,
              CASE WHEN d.text IS NULL THEN NULL
                   ELSE coalesce(lf, 0.0) END AS dup_line_frac,
              CASE WHEN d.text IS NULL THEN NULL
                   ELSE coalesce(lcf, 0.0) END AS dup_line_char_frac,
              CASE WHEN d.text IS NULL THEN NULL
                   ELSE coalesce(pf, 0.0) END AS dup_paragraph_frac,
              CASE WHEN d.text IS NULL THEN NULL
                   ELSE coalesce(pcf, 0.0) END AS dup_paragraph_char_frac
            FROM documents d LEFT JOIN pv ON d.doc_id = pv.doc_id
        """,
        "multi_ngram_repetition": _multi_ngram_oracle_sql(
            top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)
        ),
        # iterations unrolled as nested CTE levels (DuckDB forbids
        # aggregates in a recursive CTE's recursive term); ranks are
        # integer micro-units on both sides (floor(x*1e6+0.5))
        "label_propagation": label_propagation_oracle_sql(
            citation_edges, n_iter=4
        ),
        "core_numbers": core_numbers_oracle_sql(citation_edges),
        "pagerank": pagerank_oracle_sql(
            citation_edges, n_iter=6, damping=0.85, round_digits=6
        ),
        "hits": hits_oracle_sql(citation_edges, n_iter=6, round_digits=6),
        "link_reciprocity": f"""
            WITH e AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM ({citation_edges}) WHERE src <> dst
            ),
            r AS (
              SELECT e.src FROM e
              WHERE EXISTS (
                SELECT 1 FROM e e2 WHERE e2.src = e.dst AND e2.dst = e.src
              )
            ),
            o AS (SELECT src AS node, COUNT(*) AS n_out FROM e GROUP BY src),
            c AS (SELECT src AS node, COUNT(*) AS n_reciprocal FROM r GROUP BY src)
            SELECT o.node, o.n_out::BIGINT AS n_out,
                   COALESCE(c.n_reciprocal, 0)::BIGINT AS n_reciprocal,
                   ((1000000 * COALESCE(c.n_reciprocal, 0)) // o.n_out)::BIGINT
                     AS reciprocity_micro
            FROM o LEFT JOIN c ON o.node = c.node
        """,
        "local_clustering": f"""
            WITH e AS MATERIALIZED ({citation_edges}),
            und AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM e WHERE src <> dst
            ),
            nbrs AS MATERIALIZED (
              SELECT u AS node, v AS nbr FROM und
              UNION ALL
              SELECT v AS node, u AS nbr FROM und
            ),
            deg AS MATERIALIZED (
              SELECT node, COUNT(*) AS degree FROM nbrs GROUP BY node
            ),
            ws AS MATERIALIZED (
              SELECT n.node, n.nbr
              FROM nbrs n JOIN deg d ON n.node = d.node
              WHERE d.degree >= 2 AND d.degree <= 1000
            ),
            tri AS (
              SELECT a.node, COUNT(*) AS triangles
              FROM ws a JOIN ws b ON a.node = b.node AND a.nbr < b.nbr
              WHERE EXISTS (
                SELECT 1 FROM und
                WHERE und.u = a.nbr AND und.v = b.nbr
              )
              GROUP BY a.node
            )
            SELECT d.node::BIGINT AS node, d.degree::BIGINT AS degree,
                   (CASE WHEN d.degree > 1000 THEN NULL
                         ELSE COALESCE(t.triangles, 0) END)::BIGINT AS triangles,
                   {_micro_sql("CASE WHEN d.degree > 1000 THEN NULL WHEN d.degree < 2 THEN 0.0 ELSE 2.0 * COALESCE(t.triangles, 0) / (d.degree * (d.degree - 1)) END")}
                     AS clustering_micro
            FROM deg d LEFT JOIN tri t ON d.node = t.node
        """,
        "edge_support": f"""
            WITH e AS MATERIALIZED ({citation_edges}),
            und AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM e WHERE src <> dst
            ),
            nbrs AS MATERIALIZED (
              SELECT u AS node, v AS nbr FROM und
              UNION ALL
              SELECT v AS node, u AS nbr FROM und
            ),
            deg AS MATERIALIZED (
              SELECT node, COUNT(*) AS degree FROM nbrs GROUP BY node
            ),
            ws AS MATERIALIZED (
              SELECT n.node, n.nbr
              FROM nbrs n JOIN deg d ON n.node = d.node
              WHERE d.degree >= 2 AND d.degree <= 1000
            ),
            wc AS (
              SELECT a.nbr AS node_a, b.nbr AS node_b, COUNT(*) AS support
              FROM ws a JOIN ws b ON a.node = b.node AND a.nbr < b.nbr
              GROUP BY a.nbr, b.nbr
            )
            SELECT und.u::BIGINT AS node_a, und.v::BIGINT AS node_b,
                   COALESCE(wc.support, 0)::BIGINT AS support
            FROM und LEFT JOIN wc
              ON und.u = wc.node_a AND und.v = wc.node_b
        """,
        "link_prediction": f"""
            WITH e AS MATERIALIZED ({citation_edges}),
            und AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM e WHERE src <> dst
            ),
            nbrs AS MATERIALIZED (
              SELECT u AS node, v AS nbr FROM und
              UNION ALL
              SELECT v AS node, u AS nbr FROM und
            ),
            deg AS MATERIALIZED (
              SELECT node, COUNT(*) AS degree FROM nbrs GROUP BY node
            ),
            ws AS MATERIALIZED (
              SELECT n.node, n.nbr, d.degree
              FROM nbrs n JOIN deg d ON n.node = d.node
              WHERE d.degree >= 2 AND d.degree <= 1000
            ),
            pairs AS (
              SELECT a.nbr AS node_a, b.nbr AS node_b,
                     COUNT(*) AS common_neighbors,
                     SUM(1.0 / ln(a.degree)) AS adamic_adar
              FROM ws a JOIN ws b
                ON a.node = b.node AND a.nbr < b.nbr
              GROUP BY a.nbr, b.nbr
              HAVING COUNT(*) >= 2
            ),
            non_edges AS (
              SELECT p.* FROM pairs p
              WHERE NOT EXISTS (
                SELECT 1 FROM und
                WHERE und.u = p.node_a AND und.v = p.node_b
              )
            )
            SELECT p.node_a::BIGINT AS node_a, p.node_b::BIGINT AS node_b,
                   p.common_neighbors::BIGINT AS common_neighbors,
                   {_micro_sql("p.adamic_adar")} AS adamic_adar_micro,
                   {_micro_sql(
                       "p.common_neighbors::DOUBLE / "
                       "(da.degree + db.degree - p.common_neighbors)"
                   )} AS jaccard_micro
            FROM non_edges p
            JOIN deg da ON p.node_a = da.node
            JOIN deg db ON p.node_b = db.node
        """,
        "host_rank": pagerank_oracle_sql(
            f"""SELECT s.source AS src, t.source AS dst, COUNT(*) AS weight
               FROM ({citation_edges}) e
               JOIN documents s ON e.src = s.doc_id
               JOIN documents t ON e.dst = t.doc_id
               WHERE s.source <> t.source
               GROUP BY s.source, t.source""",
            n_iter=6,
            damping=0.85,
            round_digits=6,
            weighted=True,
        ),
        "trustrank": pagerank_oracle_sql(
            citation_edges,
            n_iter=6,
            damping=0.85,
            round_digits=6,
            teleport_sql=(
                "SELECT doc_id AS node, 1.0 + (doc_id % 3) AS weight "
                "FROM documents WHERE doc_id % 97 = 1"
            ),
        ),
        # ground-truth replay: the expected anchor profile computed
        # straight from the generating columns (never the regex), so
        # Spark's extract->explode->top-k path is checked end-to-end
        "anchor_texts": r"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            a AS (
              SELECT 'doc://' || ((doc_id * 17 + 7) % (SELECT n FROM nn)) AS outlink,
                     source || ' link' AS anchor
              FROM documents
              UNION ALL
              SELECT 'doc://' || ((doc_id * 31 + 3) % (SELECT n FROM nn)),
                     source
              FROM documents
            ),
            c AS (
              SELECT outlink, anchor, count(*)::BIGINT AS n_occurrences
              FROM a GROUP BY outlink, anchor
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY outlink
                ORDER BY n_occurrences DESC, anchor ASC
              ) AS rank FROM c
            )
            SELECT outlink, anchor, n_occurrences, rank::BIGINT AS rank
            FROM r WHERE rank <= 2
        """,
        "link_degrees": r"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            pages AS (
              SELECT 'doc://' || doc_id AS url,
                     '<html><a href="doc://'
                       || ((doc_id * 17 + 7) % (SELECT n FROM nn))
                       || '">a</a><a href="doc://'
                       || ((doc_id * 31 + 3) % (SELECT n FROM nn))
                       || '#frag">b</a></html>' AS html
              FROM documents
            ),
            links AS (
              SELECT url AS src, l AS dst
              FROM pages,
                   unnest(regexp_extract_all(html, 'href\s*=\s*"([^"#]*)', 1)) AS u(l)
              WHERE l IS NOT NULL AND l <> ''
            ),
            outd AS (SELECT src AS node, count(*) AS out_degree FROM links GROUP BY src),
            ind  AS (SELECT dst AS node, count(*) AS in_degree  FROM links GROUP BY dst)
            SELECT COALESCE(o.node, i.node) AS node,
                   COALESCE(out_degree, 0)::BIGINT AS out_degree,
                   COALESCE(in_degree, 0)::BIGINT AS in_degree
            FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
        """,
        "ngram_repetition": r"""
            WITH toks AS (
              SELECT doc_id,
                string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS t
              FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
            ),
            base AS (
              SELECT doc_id, length(array_to_string(t, ' ')) AS text_len, t
              FROM toks
            ),
            grams AS (
              SELECT doc_id, text_len, t[i] || ' ' || t[i + 1] AS g
              FROM base, unnest(range(1, len(t))) AS u(i)
            ),
            counts AS (
              SELECT doc_id, text_len, g, count(*) AS c
              FROM grams GROUP BY doc_id, text_len, g
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY c DESC, g ASC
              ) AS rk FROM counts
            ),
            per_doc AS (
              SELECT doc_id, text_len,
                max(CASE WHEN rk = 1 THEN c * length(g) END) AS top_chars,
                sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_chars
              FROM ranked GROUP BY doc_id, text_len
            )
            SELECT d.doc_id,
              CASE WHEN p.doc_id IS NULL OR text_len = 0 THEN 0.0
                   ELSE round(top_chars / text_len::DOUBLE, 9)
              END AS top_ngram_char_frac,
              CASE WHEN p.doc_id IS NULL OR text_len = 0 THEN 0.0
                   ELSE round(least(dup_chars / text_len::DOUBLE, 1.0), 9)
              END AS dup_ngram_char_frac
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "clean_phone": r"""
            WITH raw AS (
              SELECT c_custkey,
                     (CASE WHEN c_custkey % 3 = 0 THEN '1-' ELSE '' END)
                     || '(' || (c_custkey % 700 + 300)::VARCHAR || ') '
                     || ((c_custkey * 7) % 800 + 200)::VARCHAR || '-'
                     || lpad((c_custkey % 10000)::VARCHAR, 4, '0') AS phone_raw
              FROM customer
            ),
            digits AS (
              SELECT c_custkey,
                     regexp_extract(regexp_replace(phone_raw, '[^0-9]', '', 'g'),
                                    '1?(\d{10})', 1) AS ten
              FROM raw
            )
            SELECT c_custkey,
                   CASE WHEN ten = '' THEN NULL
                        WHEN regexp_matches(ten, '.*(0000|9999|12345).*') THEN NULL
                        ELSE ten END AS phone
            FROM digits
        """,
        "email_match_level": r"""
            WITH emails AS (
              SELECT c_custkey,
                     lower(replace(c_name, '#', '')) || '@example.com' AS e1,
                     CASE WHEN c_custkey % 2 = 0 THEN
                       substring(lower(replace(c_name, '#', '')),
                                 1, length(c_name) - 2) || 'x@example.com'
                     ELSE lower(replace(c_name, '#', '')) || '@example.com'
                     END AS e2
              FROM customer
            ),
            norm AS (
              SELECT c_custkey,
                     replace(replace(lower(regexp_extract(e1, '(\S+@\S+)', 1)), '.', ''), '_', '') AS n1,
                     replace(replace(lower(regexp_extract(e2, '(\S+@\S+)', 1)), '.', ''), '_', '') AS n2
              FROM emails
            ),
            parts AS (
              SELECT c_custkey, n1, n2,
                     string_split(n1, '@')[1] AS u1, string_split(n2, '@')[1] AS u2
              FROM norm
            )
            SELECT c_custkey,
                   CASE WHEN n1 = n2 THEN 0
                        WHEN damerau_levenshtein(n1, n2) <= 1 THEN 1
                        WHEN u1 = u2 THEN 2
                        WHEN damerau_levenshtein(u1, u2) <= 1 THEN 3
                        ELSE 4 END::BIGINT AS email_level
            FROM parts
        """,
        "haversine": """
            WITH coords AS (
              SELECT c_custkey,
                     (c_custkey % 170)::DOUBLE - 85.0 + 0.5 AS lat,
                     ((c_custkey * 7) % 360)::DOUBLE - 180.0 + 0.5 AS lon
              FROM customer
            )
            SELECT c_custkey,
                   CAST(floor(2 * 6371.0 * asin(sqrt(
                     pow(sin(radians(40.7 - lat) / 2), 2)
                     + cos(radians(lat)) * cos(radians(40.7))
                       * pow(sin(radians(-74.0 - lon) / 2), 2)
                   )) * 1000000 + 0.5) AS BIGINT) AS dist_km_micro
            FROM coords
        """,
        "diff_updates": """
            WITH before_t AS (
              SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
            ),
            after_t AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 = 0
                          THEN round(o_totalprice + 1.0, 2)
                          ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 11 <> 0
            )
            SELECT b.o_orderkey,
                   CASE WHEN b.o_totalprice IS NULL AND a.o_totalprice IS NULL
                          THEN 'remained_null'
                        WHEN a.o_totalprice IS NULL THEN 'became_null'
                        WHEN b.o_totalprice IS NULL THEN 'became_nonnull'
                        WHEN b.o_totalprice = a.o_totalprice THEN 'unchanged'
                        ELSE 'changed' END AS change
            FROM before_t b JOIN after_t a USING (o_orderkey)
            WHERE b.o_totalprice IS DISTINCT FROM a.o_totalprice
        """,
        "tf_frequency": """
            SELECT c_custkey, c_mktsegment,
                   CAST(floor(
                     count(*) OVER (PARTITION BY c_mktsegment)::DOUBLE
                     / (SELECT count(*) FROM customer) * 1000000 + 0.5)
                     AS BIGINT) AS freq_micro
            FROM customer
        """,
        # md5-family variants make the full LSH / simhash pipelines
        # engine-independent → complete oracles (the xxhash64 production
        # family shares the identical plan; tests/test_lsh.py and
        # tests/test_dedupe_extras.py verify its semantics)
        "name_match_level": _name_level_oracle_sql(),
        "updates_apply": """
            WITH a AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 = 0
                          THEN o_totalprice + 1.0
                          ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 11 <> 0
            )
            SELECT b.o_orderkey,
                   CAST(floor(b.o_totalprice * 100 + 0.5) AS BIGINT)
                     AS price_centi
            FROM orders b
            WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM a)
            UNION ALL
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS price_centi
            FROM a
        """,
        "emails_dimension": _emails_dimension_oracle_sql(),
        "address_match_level": _address_level_oracle_sql(),
        "embedding_near_dup": _embedding_near_dup_oracle_sql(),
        "contrastive_triplets": _contrastive_oracle_sql(),
        "lsh_topk": _lsh_topk_oracle_sql(),
        "semdedup": _SEMDEDUP_ORACLE_SQL,
        "dsir_select": _DSIR_ORACLE_SQL,
        "crawl_stats": """
            WITH p AS (
              SELECT 'd' || (o_custkey % 50)::VARCHAR || '.com' AS domain,
                     date_trunc('day', o_orderdate) AS day,
                     o_orderpriority AS text
              FROM orders
            )
            SELECT day, domain,
                   count(*) AS n_pages,
                   count(DISTINCT text) AS distinct_texts,
                   CAST(floor(
                     (1 - count(DISTINCT text)::DOUBLE / count(*))
                     * 1000000 + 0.5) AS BIGINT) AS dup_rate_micro
            FROM p GROUP BY day, domain
        """,
        "unnest_linker": f"""
            WITH d AS (
              SELECT doc_id,
                     list_filter({_TOKENS}, t -> length(t) >= 7) AS toks
              FROM documents
            ),
            e AS (SELECT doc_id, unnest(toks) AS tok FROM d)
            SELECT DISTINCT a.doc_id AS record_id_l, b.doc_id AS record_id_r
            FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
        """,
        "join_linker": """
            SELECT a.o_orderkey AS record_id_l, b.o_orderkey AS record_id_r
            FROM orders a JOIN orders b
              ON a.o_custkey = b.o_custkey
             AND abs(a.o_totalprice - b.o_totalprice) < 1000
             AND a.o_orderkey < b.o_orderkey
        """,
        "id_linker": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN source <> 'web' THEN doc_id % 97 END AS ssn
              FROM documents
            )
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r
            FROM d a JOIN d b ON a.ssn = b.ssn AND a.doc_id < b.doc_id
        """,
        "id_linker_indefinite": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN source <> 'web' THEN doc_id % 97 END AS ssn
              FROM documents WHERE doc_id < 150
            )
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE (a.ssn IS NOT NULL AND b.ssn IS NOT NULL AND a.ssn <> b.ssn)
               OR a.ssn IS NULL OR b.ssn IS NULL
        """,
        "ngram_jaccard": """
            WITH d AS (
              SELECT doc_id, source,
                     list_distinct(
                       list_transform(
                         generate_series(1, greatest(length(lower(text)) - 2, 0)),
                         i -> substring(lower(text), i, 3))) AS grams
              FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r,
                     CASE WHEN len(list_intersect(a.grams, b.grams)) = 0 THEN 0.0
                          ELSE len(list_intersect(a.grams, b.grams))::DOUBLE
                               / len(list_distinct(list_concat(a.grams, b.grams)))
                     END AS j
              FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
            )
            SELECT record_id_l, record_id_r,
                   CAST(floor(j * 1000000 + 0.5) AS BIGINT)
                     AS jaccard_sim_micro
            FROM pairs WHERE j >= 0.35
        """,
        "re_extract": """
            SELECT o_orderkey,
                   regexp_extract(o_orderpriority, '(\\d+)-([A-Z ]+)', 1) AS rank,
                   regexp_extract(o_orderpriority, '(\\d+)-([A-Z ]+)', 2) AS label
            FROM orders
        """,
        "name_blocker": """
            WITH c AS (
              SELECT c_custkey AS id,
                     (['WILLIAM','ROBERT','RICHARD','MARGARET','ELIZABETH',
                       'JAMES','JOHN','KATHERINE','MICHAEL'])[
                       (c_custkey % 9 + 1)::INT]
                       || (c_custkey % 53)::VARCHAR AS giv,
                     (['SMITH','JOHNSON','WILLIAMS','BROWN','JONES','GARCIA',
                       'MILLER'])[(c_custkey % 7 + 1)::INT]
                       || ((c_custkey + 3) % 53)::VARCHAR AS sur,
                     c_custkey % 7 = 0 AS swapped
              FROM customer
            ),
            n AS (
              SELECT id,
                     CASE WHEN swapped THEN sur ELSE giv END AS given,
                     CASE WHEN swapped THEN giv ELSE sur END AS surname
              FROM c
            ),
            p AS (
              SELECT id, given AS val FROM n
                WHERE given IS NOT NULL AND given <> ''
              UNION ALL
              SELECT id, surname AS val FROM n
                WHERE surname IS NOT NULL AND surname <> ''
            )
            SELECT DISTINCT a.id AS record_id_l, b.id AS record_id_r
            FROM p a JOIN p b ON a.val = b.val AND a.id < b.id
        """,
        "ngram_contamination": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       CASE WHEN len(toks) < 3
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(
                                   range(1, len(toks) - 3 + 2),
                                   i -> array_to_string(toks[i:i + 2], ' '))
                       END)) AS g
              FROM d
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
            SELECT grams.doc_id AS record_id,
                   count(*)::BIGINT AS n_ngrams,
                   sum(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_contaminated,
                   sum(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                     / count(*) AS contamination_frac
            FROM grams LEFT JOIN bench ON grams.g = bench.g
            GROUP BY grams.doc_id
        """,
        "dup_ngram_fraction": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       CASE WHEN len(toks) < 3
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(
                                   range(1, len(toks) - 3 + 2),
                                   i -> array_to_string(toks[i:i + 2], ' '))
                       END)) AS g
              FROM d
            ),
            dfc AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
            SELECT doc_id AS record_id,
                   count(*)::BIGINT AS n_ngrams,
                   sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT
                     AS n_duplicated,
                   sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE
                     / count(*) AS duplicated_frac
            FROM grams JOIN dfc ON grams.g = dfc.g
            GROUP BY doc_id
        """,
        # quantile_cont = Spark's exact percentile (same linear
        # interpolation); the NULL-cut guard mirrors Spark's null
        # propagation through the comparison sum
        "quality_buckets": """
            WITH cp AS (
              SELECT lang,
                     quantile_cont(n_chars, 0.25) AS cut_1,
                     quantile_cont(n_chars, 0.50) AS cut_2,
                     quantile_cont(n_chars, 0.75) AS cut_3
              FROM documents GROUP BY lang
            )
            SELECT d.doc_id, d.lang, d.n_chars,
                   (CASE WHEN d.n_chars IS NULL OR cut_1 IS NULL THEN NULL
                         ELSE (CASE WHEN d.n_chars > cut_1 THEN 1 ELSE 0 END
                             + CASE WHEN d.n_chars > cut_2 THEN 1 ELSE 0 END
                             + CASE WHEN d.n_chars > cut_3 THEN 1 ELSE 0 END)
                    END)::INTEGER AS bucket
            FROM documents d
            LEFT JOIN cp ON d.lang IS NOT DISTINCT FROM cp.lang
        """,
        "minhash_lsh_block": _minhash_oracle_sql(
            shingle_size=2, band_size=2, n_bands=8, seed=42, min_jaccard=0.2
        ),
        "minhash_estimate": _minhash_estimate_oracle_sql(
            shingle_size=2, band_size=2, n_bands=8, seed=42, min_jaccard=0.2
        ),
        "simhash_pairs": _simhash_oracle_sql(
            n_bits=32, seed=42, n_blocks=4, max_hamming=3
        ),
        "level_proportions": f"""
            WITH pairs AS ({pair_block}),
            lab AS (
              SELECT CASE WHEN n_chars_l = n_chars_r THEN 0
                          WHEN abs(n_chars_l - n_chars_r) <= 20 THEN 1
                          ELSE 2 END AS level
              FROM pairs
            ),
            cnt AS (SELECT level, count(*) AS n FROM lab GROUP BY level),
            lev AS (SELECT unnest([0, 1, 2]) AS level),
            c2 AS (
              SELECT lev.level, coalesce(cnt.n, 1) AS n
              FROM lev LEFT JOIN cnt USING (level)
            ),
            tot AS (SELECT sum(n) AS t FROM c2)
            SELECT level::BIGINT AS level,
                   CAST(floor(n::DOUBLE / t * 1000000 + 0.5) AS BIGINT)
                     AS prop_micro
            FROM c2, tot
        """,
        "train_labels": """
            WITH s AS (
              SELECT doc_id, n_chars, doc_id % 37 AS lt
              FROM documents WHERE doc_id % 7 = 0 AND doc_id < 6300
            ),
            mlab AS (
              SELECT CASE WHEN a.n_chars = b.n_chars THEN 0
                          WHEN abs(a.n_chars - b.n_chars) <= 20 THEN 1
                          ELSE 2 END AS level
              FROM s a JOIN s b ON a.lt = b.lt AND a.doc_id < b.doc_id
            ),
            ulab AS (
              SELECT CASE WHEN a.n_chars = b.n_chars THEN 0
                          WHEN abs(a.n_chars - b.n_chars) <= 20 THEN 1
                          ELSE 2 END AS level
              FROM s a CROSS JOIN s b WHERE a.doc_id <> b.doc_id
            ),
            lev AS (SELECT unnest([0, 1, 2]) AS level),
            mc AS (
              SELECT lev.level, coalesce(c.n, 1) AS n
              FROM lev LEFT JOIN (
                SELECT level, count(*) AS n FROM mlab GROUP BY level
              ) c USING (level)
            ),
            uc AS (
              SELECT lev.level, coalesce(c.n, 1) AS n
              FROM lev LEFT JOIN (
                SELECT level, count(*) AS n FROM ulab GROUP BY level
              ) c USING (level)
            ),
            mt AS (SELECT sum(n) AS t FROM mc),
            ut AS (SELECT sum(n) AS t FROM uc)
            SELECT 'len_cmp' AS comparer, mc.level::BIGINT AS level,
                   CAST(floor(mc.n::DOUBLE / mt.t * 1000000 + 0.5) AS BIGINT)
                     AS m_micro,
                   CAST(floor(uc.n::DOUBLE / ut.t * 1000000 + 0.5) AS BIGINT)
                     AS u_micro
            FROM mc JOIN uc USING (level), mt, ut
        """,
        "bcubed": """
            WITH a AS (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY lang, source)
                       AS component,
                     coalesce(substr(text, 1, 50), '') AS label_true
              FROM documents
            ),
            cells AS (
              SELECT component, label_true, count(*) AS o
              FROM a GROUP BY component, label_true
            ),
            cs AS (SELECT component, count(*) AS nc FROM a GROUP BY component),
            ts AS (
              SELECT label_true, count(*) AS nt FROM a GROUP BY label_true
            ),
            agg AS (
              SELECT sum(o * o / nc) AS p, sum(o * o / nt) AS r,
                     sum(o) AS n
              FROM cells JOIN cs USING (component) JOIN ts USING (label_true)
            )
            SELECT n::BIGINT AS n,
                   CAST(floor(p / n * 1000000 + 0.5) AS BIGINT)
                     AS precision_micro,
                   CAST(floor(r / n * 1000000 + 0.5) AS BIGINT)
                     AS recall_micro,
                   CAST(floor(2 * (p / n) * (r / n) / ((p / n) + (r / n))
                              * 1000000 + 0.5) AS BIGINT) AS f1_micro
            FROM agg
        """,
        "full_linker": """
            SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r
            FROM documents a JOIN documents b
              ON a.doc_id < b.doc_id
            WHERE a.doc_id % 101 = 0 AND b.doc_id % 101 = 0
        """,
        "empty_linker": """
            SELECT doc_id AS record_id_l, doc_id AS record_id_r
            FROM documents WHERE FALSE
        """,
        "train_em": _train_em_oracle_sql(),
        "ivf_topk": _IVF_TOPK_ORACLE_SQL,
        "pairwise_eval": _PAIRWISE_EVAL_ORACLE_SQL,
        "entropy_eval": _ENTROPY_EVAL_ORACLE_SQL,
        "rand_mi": _RAND_MI_ORACLE_SQL,
        "diff_stats": _DIFF_STATS_ORACLE_SQL,
    }
    # micro-quantize the textqa fraction/perplexity oracles to mirror
    # the _micro_wrap projection on the Spark side (see _micro for why
    # round(x, 6) is unsafe under the driver's raw value-hash)
    for name, keep, micro in _MICRO_WRAPPED:
        sql[name] = _micro_wrap_sql(sql[name], keep, micro)
    return sql


_MICRO_WRAPPED = [
    ("line_repetition", ["doc_id"], ["dup_line_frac", "dup_line_char_frac"]),
    (
        "paragraph_repetition",
        ["doc_id"],
        [
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_paragraph_frac",
            "dup_paragraph_char_frac",
        ],
    ),
    (
        "ngram_repetition",
        ["doc_id"],
        ["top_ngram_char_frac", "dup_ngram_char_frac"],
    ),
    (
        "multi_ngram_repetition",
        ["doc_id"],
        [f"top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n}gram_char_frac" for n in (5, 6, 7, 8, 9, 10)],
    ),
    (
        "ngram_contamination",
        ["record_id", "n_ngrams", "n_contaminated"],
        ["contamination_frac"],
    ),
    (
        "dup_ngram_fraction",
        ["record_id", "n_ngrams", "n_duplicated"],
        ["duplicated_frac"],
    ),
    ("perplexity", ["doc_id", "n_tokens"], ["cross_entropy", "perplexity"]),
    (
        "bigram_perplexity",
        ["doc_id", "n_tokens"],
        ["cross_entropy", "perplexity"],
    ),
    (
        "line_langs",
        ["doc_id", "n_lines", "dominant_lang", "is_multilingual"],
        ["frac_en", "frac_es", "frac_de", "frac_fr", "frac_und"],
    ),
    (
        "profile_numeric",
        ["column", "n", "n_null", "n_distinct"],
        ["min", "max", "mean", "p50", "p95"],
    ),
]
