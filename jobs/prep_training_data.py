"""spark-submit entry point: curate an LLM training corpus from raw docs.

The standard web-text curation funnel, each stage one declarative
DataFrame transform with a recorded row counter:

    raw docs
      -> language filter            (textqa.lang_id or trusted lang col)
      -> quality filter             (textqa.quality_score, token bounds)
      -> exact dedup, keep-first    (dedupe.exact_dedupe_keep_first)
      -> near-dup dedup, keep-first (dedupe.minhash_near_duplicates ->
                                     cluster.connected_components ->
                                     keep min doc per component)
      -> semantic dedup              (ann.semdedup over --semdedup-
                                      embeddings: within-centroid-cell
                                      cosine groups, keep one per group)
      -> corpus line dedup           (textqa.line_dedupe, opt-in via
                                      --dedup-lines: every repeated line
                                      keeps only its first occurrence)
      -> boilerplate filter          (textqa.duplicated_ngram_fraction,
                                      opt-in via --max-boilerplate-frac)
      -> benchmark decontamination   (textqa.ngram_contamination against
                                      --benchmark, broadcast eval n-grams)
      -> DSIR selection              (textqa.dsir against --dsir-target:
                                      keep the --dsir-k docs that look
                                      most like the target distribution)
      -> leakage-safe splits         (cluster_safe_splits over the
                                      near-dup graph, opt-in via
                                      --splits train=0.8,val=0.1,...)
      -> temperature mix             (mix.temperature_sample: per-lang
                                      allocation ∝ n^alpha, opt-in via
                                      --temperature-alpha/-total)
      -> chunk + pack layout         (chunk.chunk_documents token
                                      windows with lineage; then
                                      chunk.pack_sequences seq_id/
                                      seq_offset, per split)
      -> curated parquet + counters.json

Usage (cluster):
    zip -r mismo_spark.zip mismo_spark
    spark-submit --py-files mismo_spark.zip jobs/prep_training_data.py \
        --input  s3://bucket/documents/ \
        --output s3://bucket/curated/ \
        --langs en,de --min-quality 0.3 --min-tokens 5 --max-tokens 100000

Sandbox smoke:
    spark-submit --master 'local[8]' --py-files mismo_spark.zip \
        jobs/prep_training_data.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated --id-col doc_id

Scale notes: every stage is a narrow filter or one equi-shuffle
(fingerprint groupBy; LSH band join; CC rounds).  Counters cost one
count() job per stage — at 10^12 rows that is the same scan Spark
already does, and the funnel numbers are the first thing an operator
asks for.  No stage collects data to the driver.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet of documents")
    ap.add_argument("--output", required=True, help="output dir (parquet + counters.json)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--langs", default=None,
                    help="comma list to keep, e.g. 'en,de'; matched against "
                    "the table's lang column when present, else textqa.lang_id")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--min-tokens", type=int, default=1)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--shingle-size", type=int, default=3)
    ap.add_argument("--lsh-band-size", type=int, default=2)
    ap.add_argument("--lsh-n-bands", type=int, default=16)
    ap.add_argument("--min-jaccard", type=float, default=0.7)
    ap.add_argument("--skip-neardup", action="store_true")
    ap.add_argument("--neardup-verify", choices=("exact", "estimate"),
                    default="exact",
                    help="candidate verify: 'exact' = shingle-set "
                    "Jaccard rejoin; 'estimate' = sketch-agreement "
                    "fraction (O(n_hashes)/pair, broadcasts at corpus "
                    "sizes where shingle arrays cannot)")
    ap.add_argument("--neardup-keep", choices=("first", "longest"),
                    default="first",
                    help="survivor per near-dup cluster: 'first' = "
                    "smallest record id, 'longest' = longest text "
                    "(ties -> smallest id)")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval/benchmark docs to decontaminate "
                    "against (column --benchmark-text-col)")
    ap.add_argument("--benchmark-text-col", default=None,
                    help="text column in --benchmark (default: --text-col)")
    ap.add_argument("--decontaminate-ngram", type=int, default=13,
                    help="n-gram size for the contamination check")
    ap.add_argument("--max-contaminated-ngrams", type=int, default=0,
                    help="drop docs sharing more than this many n-grams "
                    "with the benchmark (0 = the strict GPT-3 rule)")
    ap.add_argument("--max-boilerplate-frac", type=float, default=None,
                    help="drop docs whose duplicated-ngram fraction "
                    "(--boilerplate-ngram grams in >= --boilerplate-min-df "
                    "docs) exceeds this")
    ap.add_argument("--boilerplate-ngram", type=int, default=5)
    ap.add_argument("--boilerplate-min-df", type=int, default=2)
    ap.add_argument("--gopher-rules", action="store_true",
                    help="drop docs failing the Gopher A1.1 quality "
                    "screen (word count, word length, symbol/bullet/"
                    "ellipsis ratios, alpha fraction, stopwords)")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--c4-clean", action="store_true",
                    help="apply C4 line rules to the text column "
                    "(terminal punctuation, min words, boilerplate) "
                    "and drop docs left empty / flagged "
                    "(lorem ipsum, curly braces)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="mask emails/phones/IPv4s in the text column")
    ap.add_argument("--dedup-lines", action="store_true",
                    help="corpus-level line dedup (C4 s2.2/RefinedWeb): "
                         "drop every occurrence but the first of any "
                         "repeated eligible line")
    ap.add_argument("--dedup-line-min-words", type=int, default=3)
    ap.add_argument("--dedup-line-min-count", type=int, default=2)
    ap.add_argument("--perplexity-order", type=int, choices=(1, 2),
                    default=1,
                    help="LM order for --max-perplexity: 1 = unigram, "
                    "2 = bigram Stupid Backoff (word-order-sensitive)")
    ap.add_argument("--max-perplexity", type=float, default=None,
                    help="drop docs whose LM self-perplexity exceeds "
                    "this (CCNet-style screen; LM trained on the "
                    "surviving corpus itself). --perplexity-order "
                    "picks the LM: 1 = unigram perplexity, 2 = bigram "
                    "Stupid-Backoff score exp(mean -ln S) — an "
                    "UNNORMALIZED scale, tune the threshold per order")
    ap.add_argument("--perplexity-keep-frac", type=float, default=None,
                    help="CCNet-style percentile screen: keep only the "
                    "lowest-perplexity FRACTION of documents, tiered per "
                    "language when the input has a 'lang' column (cut "
                    "points from one exact-percentile aggregation per "
                    "group — never a corpus-wide sort).  Composes with "
                    "--max-perplexity (the absolute cap applies first; "
                    "the LM is fit once on this stage's input)")
    ap.add_argument("--gopher-repetition", action="store_true",
                    help="apply the COMPLETE Gopher A1.1 repetition "
                    "screen (dup-line fractions + top-{2,3,4}-gram + "
                    "dup-{5..10}-gram char fractions at the paper's "
                    "Table A1 thresholds) — every n-gram signal from "
                    "one corpus pass")
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="Gopher-style repetition filter: drop docs whose "
                    "duplicate-line fraction exceeds this (e.g. 0.30)")
    ap.add_argument("--max-dup-ngram-frac", type=float, default=None,
                    help="drop docs whose duplicated word-2-gram char "
                    "fraction exceeds this (e.g. 0.20)")
    ap.add_argument("--remove-dup-spans", action="store_true",
                    help="ExactSubstr-style surgery: cut maximal token "
                    "spans whose --dup-span-ngram windows occur >= "
                    "--dup-span-min-count times in the corpus, instead "
                    "of dropping whole documents")
    ap.add_argument("--dup-span-ngram", type=int, default=50,
                    help="token window for --remove-dup-spans (Lee et "
                    "al. 2022 use 50-token windows)")
    ap.add_argument("--dup-span-min-count", type=int, default=2)
    ap.add_argument("--history-fingerprints", default=None,
                    help="parquet of md5 text fingerprints already "
                    "ingested in earlier snapshots (column named by "
                    "--history-fp-col): drop this batch's docs whose "
                    "normalized text was seen before.  A Bloom filter "
                    "over the history prescreens — definite-miss docs "
                    "skip the exact history join entirely, the 10^12-"
                    "history shape")
    ap.add_argument("--history-fp-col", default="fp")
    ap.add_argument("--history-bloom-bits", type=int, default=1 << 22)
    ap.add_argument("--semdedup-embeddings", default=None,
                    help="parquet of (id, embedding) vectors: enable "
                    "SemDeDup semantic dedup (Abbas et al. 2023) — "
                    "within-centroid-cell cosine groups, keep one doc "
                    "per group (the paper's low-centroid-sim rule)")
    ap.add_argument("--semdedup-id-col", default="doc_id",
                    help="id column of --semdedup-embeddings matching "
                    "the document ids")
    ap.add_argument("--semdedup-vec-col", default="embedding")
    ap.add_argument("--semdedup-min-cosine", type=float, default=0.95)
    ap.add_argument("--semdedup-cells", type=int, default=64,
                    help="number of k-means centroid cells (trained "
                    "deterministically on a hash-ordered sample)")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of target-distribution documents: "
                    "enable DSIR selection (Xie et al. 2023) — keep "
                    "the --dsir-k docs whose hashed-n-gram "
                    "distribution best matches this corpus")
    ap.add_argument("--dsir-k", type=int, default=None,
                    help="number of documents DSIR keeps (required "
                    "with --dsir-target)")
    ap.add_argument("--dsir-buckets", type=int, default=10_000)
    ap.add_argument("--dsir-target-text-col", default=None,
                    help="text column of the DSIR target corpus "
                    "(default: --text-col)")
    ap.add_argument("--temperature-alpha", type=float, default=None,
                    help="rebalance the per-language mix: allocation "
                    "per lang ∝ n^alpha (alpha=1 natural, alpha→0 "
                    "uniform); requires --temperature-total")
    ap.add_argument("--temperature-total", type=int, default=None,
                    help="total docs the temperature-rebalanced mix "
                    "keeps")
    ap.add_argument("--chunk-tokens", type=int, default=None,
                    help="split surviving docs into token-window "
                    "chunks of this size (doc rows become chunk rows "
                    "with doc_id/chunk_id lineage)")
    ap.add_argument("--chunk-overlap", type=int, default=0,
                    help="tokens shared between consecutive chunks")
    ap.add_argument("--pack-tokens", type=int, default=None,
                    help="assign output rows to training sequences of "
                    "this token budget (adds seq_id/seq_offset; "
                    "packed per split when --splits is active)")
    ap.add_argument("--splits", default=None,
                    help="leakage-safe split column, e.g. "
                    "'train=0.8,val=0.1,test=0.1' — assigned by the "
                    "md5 of the near-dup CLUSTER so near-duplicates "
                    "never straddle a boundary")
    ap.add_argument("--split-min-jaccard", type=float, default=0.5,
                    help="near-dup threshold for the split-clustering "
                    "graph (looser than dedupe's, to catch survivors)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)
    # validate BEFORE any Spark work: a bad fraction must not cost a
    # full LM-scoring pass first
    if args.perplexity_keep_frac is not None and not (
        0.0 < args.perplexity_keep_frac < 1.0
    ):
        raise SystemExit(
            "--perplexity-keep-frac must be in (0, 1), got "
            f"{args.perplexity_keep_frac}"
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("mismo_spark_prep_training_data")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.dedupe import exact_dedupe_keep_first, minhash_near_duplicates
    from mismo_spark.textqa import lang_id, quality_score, token_count

    t0 = time.time()
    counters: dict[str, int] = {}

    docs = spark.read.parquet(args.input).withColumn(
        "record_id", F.col(args.id_col)
    )
    text = F.col(args.text_col)
    counters["input_docs"] = docs.count()

    # -- language filter --------------------------------------------------
    if args.langs:
        keep = [s.strip() for s in args.langs.split(",") if s.strip()]
        lang = F.col("lang") if "lang" in docs.columns else lang_id(text)
        docs = docs.filter(lang.isin(keep))
        counters["after_lang_filter"] = docs.count()

    # -- quality filter ---------------------------------------------------
    ntok = token_count(text)
    docs = docs.filter(
        text.isNotNull()
        & (quality_score(text) >= args.min_quality)
        & (ntok >= args.min_tokens)
        & (ntok <= args.max_tokens)
    )
    counters["after_quality_filter"] = docs.count()

    # -- exact dedup (normalized fingerprint, keep smallest id) -----------
    docs = exact_dedupe_keep_first(docs, args.text_col, id_column="record_id")
    counters["after_exact_dedupe"] = docs.count()

    # -- near-dup dedup ---------------------------------------------------
    if not args.skip_neardup:
        pairs = minhash_near_duplicates(
            docs,
            text_column=args.text_col,
            shingle_size=args.shingle_size,
            band_size=args.lsh_band_size,
            n_bands=args.lsh_n_bands,
            min_jaccard=args.min_jaccard,
            seed=args.seed,
            verify=args.neardup_verify,
        )
        comps = connected_components(
            pairs.select("record_id_l", "record_id_r"),
            docs.select("record_id"),
            algorithm="star",
        )
        if args.neardup_keep == "longest":
            # survivor = longest text, ties -> smallest id (total order)
            keep_ids = (
                comps.join(
                    docs.select("record_id", F.length(text).alias("__len")),
                    "record_id",
                )
                .groupBy("component")
                .agg(
                    F.max_by(
                        "record_id",
                        F.struct(
                            F.coalesce(F.col("__len"), F.lit(-1)).alias("l"),
                            (-F.col("record_id")).alias("i"),
                        ),
                    ).alias("record_id")
                )
            )
        else:
            keep_ids = comps.groupBy("component").agg(
                F.min("record_id").alias("record_id")
            )
        docs = docs.join(keep_ids.select("record_id"), "record_id", "left_semi")
        counters["after_neardup_dedupe"] = docs.count()

    # -- cross-snapshot history dedup (Bloom prescreen + exact join) --------
    if args.history_fingerprints:
        from mismo_spark.dedupe.bloom import bloom_build, bloom_might_contain
        from mismo_spark.textqa import fingerprint_hex

        history = spark.read.parquet(args.history_fingerprints).select(
            F.col(args.history_fp_col).alias("__hfp")
        )
        bloom = bloom_build(
            history, "__hfp", n_bits=args.history_bloom_bits, seed=args.seed
        )
        tagged = bloom_might_contain(
            docs.withColumn("__fp", fingerprint_hex(text)),
            bloom,
            "__fp",
            n_bits=args.history_bloom_bits,
            seed=args.seed,
            out="__maybe",
        )
        fresh = tagged.where(~F.col("__maybe"))
        maybe = tagged.where(F.col("__maybe"))
        counters["history_bloom_candidates"] = maybe.count()
        confirmed_new = maybe.join(
            history, maybe["__fp"] == history["__hfp"], "left_anti"
        )
        docs = fresh.unionByName(confirmed_new).drop("__fp", "__maybe")
        counters["after_history_dedup"] = docs.count()

    # -- SemDeDup: embedding-space semantic dedup ---------------------------
    if args.semdedup_embeddings:
        from pyspark.sql import Window

        from mismo_spark.ann.ivf import train_centroids
        from mismo_spark.ann.semdedup import assign_cells, semdedup

        emb = spark.read.parquet(args.semdedup_embeddings).select(
            F.col(args.semdedup_id_col).alias("record_id"),
            F.col(args.semdedup_vec_col).alias("__v"),
        )
        # only surviving docs participate; docs WITHOUT an embedding
        # pass through untouched (they can't be semantically compared)
        emb = emb.join(docs.select("record_id"), "record_id", "left_semi")
        # re-run embedding jobs commonly leave duplicate rows per id;
        # a duplicated id would get a spurious keep=False rank in the
        # keep window and delete a doc with NO semantic duplicate —
        # keep one row per id, deterministically (vector-hash order)
        w_dup = Window.partitionBy("record_id").orderBy(
            F.xxhash64(F.to_json(F.struct("__v")))
        )
        emb = (
            emb.withColumn("__rn", F.row_number().over(w_dup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        cents = train_centroids(
            emb,
            id_column="record_id",
            vec_column="__v",
            n_lists=args.semdedup_cells,
            seed=args.seed,
        )
        # caller-managed assignment cache: unpersist after the counter
        # materializes, so the corpus-sized table doesn't pin executor
        # memory through the remaining funnel stages
        assigned = assign_cells(
            emb, cents, vec_column="__v",
            cell_column="cell", cos_column="cent_cos",
        ).select("record_id", "cell", "cent_cos").persist()
        dropped = semdedup(
            emb,
            cents,
            id_column="record_id",
            vec_column="__v",
            min_cosine=args.semdedup_min_cosine,
            assigned=assigned,
        ).filter(~F.col("keep"))
        docs = docs.join(
            dropped.select("record_id"), "record_id", "left_anti"
        ).persist()
        counters["after_semdedup"] = docs.count()
        assigned.unpersist()

    # -- Gopher quality screen ---------------------------------------------
    if args.gopher_rules:
        from mismo_spark.textqa.gopher import gopher_rules

        g = gopher_rules(F.col(args.text_col), min_words=args.gopher_min_words)
        docs = docs.filter(g["passes"])
        counters["after_gopher_rules"] = docs.count()

    # -- C4 line cleaning / doc flags / PII --------------------------------
    if args.c4_clean:
        from mismo_spark.textqa.clean import c4_clean_lines, c4_doc_flags

        flags = c4_doc_flags(F.col(args.text_col))
        docs = (
            docs.withColumn(args.text_col, c4_clean_lines(F.col(args.text_col)))
            .filter(F.length(F.col(args.text_col)) > 0)
            .filter(~flags["has_lorem_ipsum"] & ~flags["has_curly_brace"])
        )
        counters["after_c4_clean"] = docs.count()

    if args.redact_pii:
        from mismo_spark.textqa.clean import redact_pii

        docs = docs.withColumn(args.text_col, redact_pii(F.col(args.text_col)))

    # -- corpus-level line dedup (C4 §2.2 / RefinedWeb) ---------------------
    if args.dedup_lines:
        from mismo_spark.textqa.line_dedupe import corpus_line_dedupe

        deduped = corpus_line_dedupe(
            docs,
            min_words=args.dedup_line_min_words,
            min_count=args.dedup_line_min_count,
            id_col="record_id",
            text_col=args.text_col,
        )
        # count removals BEFORE dropping emptied docs, or a fully-
        # boilerplate doc's removals vanish from the funnel
        counters["lines_removed_corpus_dedup"] = int(
            deduped.agg(F.sum("n_lines_removed")).collect()[0][0] or 0
        )
        docs = deduped.drop("n_lines_removed").filter(
            F.length(F.col(args.text_col)) > 0
        )
        counters["after_line_dedup"] = docs.count()

    # -- LM perplexity screen (unigram or bigram Stupid Backoff) ------------
    if args.max_perplexity is not None or args.perplexity_keep_frac is not None:
        from mismo_spark.textqa.lm import bigram_perplexity, unigram_perplexity

        score_fn = (
            bigram_perplexity if args.perplexity_order == 2
            else unigram_perplexity
        )
        ppl = score_fn(docs, id_col="record_id", text_col=args.text_col)
        if args.max_perplexity is not None:
            bad = ppl.where(F.col("perplexity") > args.max_perplexity)
            docs = docs.join(bad.select("record_id"), "record_id", "left_anti")
            counters["after_perplexity_filter"] = docs.count()
        if args.perplexity_keep_frac is not None:
            frac = args.perplexity_keep_frac
            from mismo_spark.textqa.buckets import quality_buckets

            by = ["lang"] if "lang" in docs.columns else []
            scored = docs.select("record_id", *by).join(
                ppl.select("record_id", "perplexity"), "record_id"
            )
            kept = quality_buckets(
                scored, "perplexity", by=by, cuts=(frac,)
            ).where(F.col("bucket") == 0)
            docs = docs.join(kept.select("record_id"), "record_id", "left_semi")
            counters["after_perplexity_keep_frac"] = docs.count()

    # -- within-doc repetition filters (Gopher A1.1) -----------------------
    if args.gopher_repetition:
        from mismo_spark.textqa.repetition import gopher_repetition_flags

        flags = gopher_repetition_flags(
            docs, id_col="record_id", text_col=args.text_col
        ).where(F.col("passes"))
        docs = docs.join(flags.select("record_id"), "record_id", "left_semi")
        counters["after_gopher_repetition"] = docs.count()

    if args.max_dup_line_frac is not None:
        from mismo_spark.textqa.repetition import line_repetition_signals

        rep = line_repetition_signals(
            docs, id_col="record_id", text_col=args.text_col
        ).filter(F.col("dup_line_frac") > args.max_dup_line_frac)
        docs = docs.join(rep.select("record_id"), "record_id", "left_anti")
        counters["after_dup_line_filter"] = docs.count()

    if args.max_dup_ngram_frac is not None:
        from mismo_spark.textqa.repetition import ngram_repetition_signals

        rep = ngram_repetition_signals(
            docs, n=2, id_col="record_id", text_col=args.text_col
        ).filter(F.col("dup_ngram_char_frac") > args.max_dup_ngram_frac)
        docs = docs.join(rep.select("record_id"), "record_id", "left_anti")
        counters["after_dup_ngram_filter"] = docs.count()

    # -- duplicated-span surgery (ExactSubstr) ------------------------------
    if args.remove_dup_spans:
        from mismo_spark.textqa.spans import remove_duplicated_spans

        docs = remove_duplicated_spans(
            docs,
            n=args.dup_span_ngram,
            min_count=args.dup_span_min_count,
            id_col="record_id",
            text_col=args.text_col,
            out=args.text_col,
        ).filter(F.length(F.col(args.text_col)) > 0)
        counters["after_dup_span_removal"] = docs.count()

    # -- boilerplate filter (duplicated-ngram fraction) --------------------
    if args.max_boilerplate_frac is not None:
        from mismo_spark.textqa.contamination import duplicated_ngram_fraction

        bp = duplicated_ngram_fraction(
            docs,
            n=args.boilerplate_ngram,
            min_df=args.boilerplate_min_df,
            id_col="record_id",
            text_col=args.text_col,
        ).filter(F.col("duplicated_frac") > args.max_boilerplate_frac)
        docs = docs.join(bp.select("record_id"), "record_id", "left_anti")
        counters["after_boilerplate_filter"] = docs.count()

    # -- benchmark decontamination ----------------------------------------
    if args.benchmark:
        from mismo_spark.textqa.contamination import ngram_contamination

        bench = spark.read.parquet(args.benchmark)
        contaminated = ngram_contamination(
            docs,
            bench,
            n=args.decontaminate_ngram,
            id_col="record_id",
            text_col=args.text_col,
            bench_text_col=args.benchmark_text_col,
        ).filter(F.col("n_contaminated") > args.max_contaminated_ngrams)
        docs = docs.join(
            contaminated.select("record_id"), "record_id", "left_anti"
        )
        counters["after_decontamination"] = docs.count()

    # -- DSIR target-distribution selection ---------------------------------
    if args.dsir_target:
        if not args.dsir_k:
            raise SystemExit("--dsir-k is required with --dsir-target")
        from mismo_spark.textqa.dsir import dsir_select

        target = spark.read.parquet(args.dsir_target)
        tcol = args.dsir_target_text_col or args.text_col
        # target rows need no ids: dsir_select only reads target text
        # (the Gumbel keys come from RAW ids)
        selected = dsir_select(
            docs.select("record_id", F.col(args.text_col).alias("__t")),
            target.select(F.col(tcol).alias("__t")),
            k=args.dsir_k,
            id_col="record_id",
            text_col="__t",
            n_buckets=args.dsir_buckets,
            gumbel_seed=args.seed,
        )
        docs = docs.join(
            selected.select("record_id"), "record_id", "left_semi"
        )
        counters["after_dsir_select"] = docs.count()

    # -- leakage-safe split assignment --------------------------------------
    if args.splits:
        from mismo_spark.cluster.cc import connected_components
        from mismo_spark.dedupe import minhash_near_duplicates
        from mismo_spark.splits import cluster_safe_splits

        fractions = {}
        for part in args.splits.split(","):
            name, _, frac = part.partition("=")
            fractions[name.strip()] = float(frac)
        # split by NEAR-DUP cluster so near-duplicates that survived
        # dedupe thresholds still never straddle a boundary
        pairs = minhash_near_duplicates(
            docs,
            text_column=args.text_col,
            shingle_size=args.shingle_size,
            band_size=args.lsh_band_size,
            n_bands=args.lsh_n_bands,
            min_jaccard=args.split_min_jaccard,
            seed=args.seed,
        )
        comps = connected_components(
            pairs.select("record_id_l", "record_id_r"),
            docs.select("record_id"),
            algorithm="star",
        )
        docs = cluster_safe_splits(docs, comps, fractions, seed=args.seed)
        for name in fractions:
            counters[f"split_{name}"] = docs.where(
                F.col("split") == name
            ).count()
        docs = docs.drop("component")

    # -- temperature-rebalanced language mix --------------------------------
    if args.temperature_alpha is not None or args.temperature_total is not None:
        if not (args.temperature_alpha and args.temperature_total):
            raise SystemExit(
                "--temperature-alpha and --temperature-total go together"
            )
        from mismo_spark.mix import temperature_sample

        docs = temperature_sample(
            docs,
            ["lang"],
            total=args.temperature_total,
            alpha=args.temperature_alpha,
            id_col="record_id",
            seed=args.seed,
        ).drop("n_group", "n_target")
        counters["after_temperature_mix"] = docs.count()

    # -- training-run layout: chunk, then pack ------------------------------
    if args.chunk_tokens is not None:
        from mismo_spark.chunk import chunk_documents

        chunks = chunk_documents(
            docs,
            chunk_tokens=args.chunk_tokens,
            overlap_tokens=args.chunk_overlap,
            id_col="record_id",
            text_col=args.text_col,
        )
        # chunk rows replace doc rows; lineage = (record_id, chunk_id);
        # non-text doc attributes rejoin from the narrow doc table
        attrs = docs.drop(args.text_col)
        docs = chunks.withColumnRenamed("chunk_text", args.text_col).join(
            attrs, "record_id"
        )
        counters["output_chunks"] = docs.count()

    if args.pack_tokens is not None:
        from mismo_spark.chunk import pack_sequences
        from mismo_spark.textqa import token_count

        if "n_tokens" not in docs.columns:
            docs = docs.withColumn(
                "n_tokens", token_count(F.col(args.text_col)).cast("long")
            )
        by = ["split"] if args.splits else None
        id_for_layout = (
            "record_id" if args.chunk_tokens is None else "chunk_uid"
        )
        if args.chunk_tokens is not None:
            docs = docs.withColumn(
                "chunk_uid",
                F.concat_ws("#", F.col("record_id"), F.col("chunk_id")),
            )
        docs = pack_sequences(
            docs,
            seq_tokens=args.pack_tokens,
            by=by,
            id_col=id_for_layout,
            seed=args.seed,
        )
        if args.chunk_tokens is not None:
            docs = docs.drop("chunk_uid")
        counters["n_sequences"] = (
            docs.select(*(by or []), "seq_id").distinct().count()
        )

    # -- write ------------------------------------------------------------
    out_path = f"{args.output}/documents.parquet"
    docs.drop("record_id").write.mode("overwrite").parquet(out_path)
    counters["written_docs"] = spark.read.parquet(out_path).count()
    counters["wall_sec"] = round(time.time() - t0, 1)

    # counters are tiny driver-side JSON; plain file IO covers local /
    # NFS work dirs — on object stores they remain in the job log below
    try:
        import os

        os.makedirs(args.output, exist_ok=True)
        with open(f"{args.output}/counters.json", "w") as f:
            json.dump(counters, f, indent=2)
    except OSError:
        pass
    print(json.dumps(counters))
    return counters


if __name__ == "__main__":
    main()
