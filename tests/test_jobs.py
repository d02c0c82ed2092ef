"""spark-submit job entry points run in-process (the driver's
`--py-files` path is exercised by importing the job module and calling
``main`` with local paths, sharing the test SparkSession via
``getOrCreate``)."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.prep_training_data import main as prep_main

SF_DIR = "/root/testdata/sf0.001"


def test_prep_training_data_funnel(spark, tmp_path):
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--langs", "en,de,es,fr",
        "--min-tokens", "1",
        "--min-jaccard", "0.5",
    ])
    # funnel counters must be monotonically non-increasing
    order = [
        "input_docs", "after_lang_filter", "after_quality_filter",
        "after_exact_dedupe", "after_neardup_dedupe", "written_docs",
    ]
    vals = [counters[k] for k in order if k in counters]
    assert vals == sorted(vals, reverse=True) or all(
        a >= b for a, b in zip(vals, vals[1:])
    )
    assert counters["written_docs"] > 0
    # counters.json written next to the parquet
    with open(f"{out}/counters.json") as f:
        assert json.load(f)["written_docs"] == counters["written_docs"]
    # curated output is readable and id-unique
    got = spark.read.parquet(f"{out}/documents.parquet")
    assert got.count() == counters["written_docs"]
    assert got.select("doc_id").distinct().count() == counters["written_docs"]


def test_prep_training_data_deterministic(spark, tmp_path):
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        prep_main([
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--id-col", "doc_id",
            "--skip-neardup",
        ])
        ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/documents.parquet")
            .select("doc_id").collect()
        }
        outs.append(ids)
    assert outs[0] == outs[1]


def test_prep_training_data_decontaminate_and_boilerplate(spark, tmp_path):
    # benchmark = a deterministic slice of the same docs -> those docs
    # (and any doc sharing a 3-gram with them) must be dropped
    bench_path = str(tmp_path / "bench.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.filter(F.col("doc_id") % 11 == 0).select("text").write.parquet(bench_path)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--skip-neardup",
        "--benchmark", bench_path,
        "--decontaminate-ngram", "3",
        "--max-boilerplate-frac", "0.99",
        "--boilerplate-ngram", "3",
    ])
    assert "after_decontamination" in counters
    assert "after_boilerplate_filter" in counters
    assert counters["after_decontamination"] <= counters["after_boilerplate_filter"]
    assert counters["written_docs"] == counters["after_decontamination"]
    # every benchmark doc's text is gone from the curated output
    got = spark.read.parquet(f"{out}/documents.parquet")
    bench_texts = {r["text"] for r in spark.read.parquet(bench_path).collect()}
    kept_texts = {r["text"] for r in got.select("text").collect()}
    assert not (bench_texts & kept_texts)


def test_prep_training_data_repetition_filters(spark, tmp_path):
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--skip-neardup",
        "--max-dup-line-frac", "0.9",
        "--max-dup-ngram-frac", "0.95",
    ])
    assert "after_dup_line_filter" in counters
    assert "after_dup_ngram_filter" in counters
    assert counters["after_dup_ngram_filter"] <= counters["after_dup_line_filter"]
    assert counters["written_docs"] == counters["after_dup_ngram_filter"]
    assert counters["written_docs"] > 0


def test_prep_training_data_c4_and_pii(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    rows = [
        # survives C4, has an email to redact
        (1, "A proper sentence with j.doe@corp.example.com inside it.\n"
            "Another good line follows here.", "en"),
        # all lines fail C4 (no terminal punctuation) -> dropped
        (2, "no punctuation here at all", "en"),
        # lorem ipsum flag -> dropped
        (3, "Lorem ipsum dolor sit amet consectetur.", "en"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--langs", "en",
        "--min-tokens", "1",
        "--skip-neardup",
        "--c4-clean",
        "--redact-pii",
    ])
    assert counters["after_c4_clean"] == 1
    got = spark.read.parquet(f"{out}/documents.parquet").collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    assert "<EMAIL>" in got[0]["text"]
    assert "corp.example.com" not in got[0]["text"]


def test_prep_training_data_neardup_keep_longest(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + ".", "en"),                      # shorter near-dup
        (2, base + " with an extra long tail.", "en"),  # longest -> survives
        (3, "completely different content lives here.", "en"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--min-jaccard", "0.5",
        "--neardup-keep", "longest",
    ])
    assert counters["after_neardup_dedupe"] == 2
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert kept == {2, 3}


def test_prep_training_data_dup_span_removal(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    boiler = "all rights reserved contact us today for more info now"
    rows = [
        (1, f"alpha beta gamma delta {boiler} epsilon zeta.", "en"),
        (2, f"one two three four five six {boiler} seven.", "en"),
        (3, "entirely unique words live here with no repeats at all.", "en"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--skip-neardup",
        "--remove-dup-spans",
        "--dup-span-ngram", "5",
    ])
    assert counters["after_dup_span_removal"] == 3
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/documents.parquet").collect()
    }
    assert boiler not in got[1] and boiler not in got[2]
    assert "alpha beta gamma delta" in got[1]
    assert got[3] == rows[2][1].lower()


def test_link_records_job(spark, tmp_path):
    """Two-table linkage: a recrawl slice must link back to its source
    pages with the recrawled url as best match."""
    from jobs.link_records import main as link_main
    from mismo_spark.corpus import make_corpus

    # few domains -> domain blocking yields plenty of cross-entity
    # (non-match) pairs, which the EM needs to separate the classes
    corpus = make_corpus(
        spark, n_entities=60, seed=42, n_domains=8
    ).drop("label_true")
    right_p = str(tmp_path / "right.parquet")
    corpus.write.mode("overwrite").parquet(right_p)
    # left = 60 recrawled pages (same content, new url suffix)
    left_p = str(tmp_path / "left.parquet")
    corpus.limit(60).withColumn(
        "url", F.concat(F.col("url"), F.lit("?recrawl=1"))
    ).write.mode("overwrite").parquet(left_p)

    # deterministic monotone weights (EM on a 60-page toy corpus is
    # not guaranteed monotone; production runs pass --weights-json too)
    from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights

    wpath = str(tmp_path / "w.json")
    Weights([
        ComparerWeights("text_jaccard", [
            LevelWeights("exact", m=0.55, u=0.001),
            LevelWeights("very_close", m=0.3, u=0.01),
            LevelWeights("close", m=0.1, u=0.05),
            LevelWeights("weak", m=0.04, u=0.2),
            LevelWeights("else", m=0.01, u=0.739),
        ]),
        ComparerWeights("shingle_jaccard", [
            LevelWeights("high", m=0.7, u=0.01),
            LevelWeights("mid", m=0.2, u=0.05),
            LevelWeights("low", m=0.08, u=0.2),
            LevelWeights("else", m=0.02, u=0.74),
        ]),
        ComparerWeights("text_prefix_lev", [
            LevelWeights("close", m=0.8, u=0.05),
            LevelWeights("mid", m=0.15, u=0.2),
            LevelWeights("else", m=0.05, u=0.75),
        ]),
        ComparerWeights("url_path_jw", [
            LevelWeights("close", m=0.7, u=0.05),
            LevelWeights("mid", m=0.2, u=0.2),
            LevelWeights("else", m=0.1, u=0.75),
        ]),
    ]).to_json(wpath)

    out = str(tmp_path / "links.parquet")
    res = link_main([
        "--left", left_p,
        "--right", right_p,
        "--output", out,
        "--weights-json", wpath,
        "--best-match-only",
    ])
    assert res["links"] > 0
    links = spark.read.parquet(out)
    # a recrawled page's best match must include its own original url
    self_hits = links.filter(
        F.col("record_id_l") == F.concat(F.col("record_id_r"), F.lit("?recrawl=1"))
    ).count()
    assert self_hits >= 50

    # same corpus through --one-to-one: the greedy assignment must be
    # strictly 1:1 on BOTH sides and keep the recrawl self-matches
    out2 = str(tmp_path / "links_121.parquet")
    res2 = link_main([
        "--left", left_p,
        "--right", right_p,
        "--output", out2,
        "--weights-json", wpath,
        "--one-to-one",
    ])
    assert res2["links"] > 0
    links2 = spark.read.parquet(out2)
    n = links2.count()
    assert links2.select("record_id_l").distinct().count() == n
    assert links2.select("record_id_r").distinct().count() == n
    self_hits2 = links2.filter(
        F.col("record_id_l") == F.concat(F.col("record_id_r"), F.lit("?recrawl=1"))
    ).count()
    assert self_hits2 >= 50


def test_prep_training_data_gopher(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    good = ("the quick brown fox jumps over the lazy dog and runs to have "
            "a rest with all of that done today " * 3)
    rows = [(1, good, "en"), (2, "## ## ## ##", "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--langs", "en", "--min-tokens", "1", "--skip-neardup",
        "--gopher-rules", "--gopher-min-words", "20",
    ])
    assert counters["after_gopher_rules"] == 1
    assert counters["written_docs"] == 1


def test_prep_training_data_dedup_lines(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    footer = "all rights reserved by example industries"
    rows = [
        (1, f"alpha unique body one\n{footer}", "en"),
        (2, f"beta unique body two\n{footer}", "en"),
        (3, f"gamma unique body three\n{footer}", "en"),
        (4, footer, "en"),  # footer-only doc: emptied then dropped
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--skip-neardup",
        "--dedup-lines",
    ])
    # first occurrence (doc 1) keeps the footer; docs 2-3 lose it;
    # doc 4 becomes empty and is dropped from the corpus
    assert counters["lines_removed_corpus_dedup"] == 3
    assert counters["after_line_dedup"] == 3
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/documents.parquet").collect()
    }
    assert set(got) == {1, 2, 3}
    assert footer in got[1]
    assert footer not in got[2] and footer not in got[3]


def test_prep_training_data_neardup_estimate(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base, "en") for i in range(4)] + [
        (10, "a totally different document about locomotives and rail", "en")
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--neardup-verify", "estimate",
    ])
    # identical docs collapse to one survivor either way; exact dedupe
    # already removes the byte-identical copies here, so the estimate
    # path must not reintroduce or over-drop anything
    assert counters["written_docs"] == 2


def test_prep_training_data_perplexity_filter(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common, "en") for i in range(5)] + [
        (10, common + f" variant{i}", "en") for i in range(3)
    ] + [
        (20, "zyx qwv jkl pqr mno abc def ghi stu", "en")  # gibberish
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    base = [
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
    ]
    import shutil

    no_filter = prep_main(base)
    shutil.rmtree(out)
    filtered = prep_main(base + ["--max-perplexity", "30"])
    assert "after_perplexity_filter" in filtered
    # the gibberish doc scores far above the common-word docs and drops
    assert filtered["written_docs"] == no_filter["written_docs"] - 1
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert 20 not in kept


def test_prep_training_data_splits(spark, tmp_path):
    import hashlib

    src = str(tmp_path / "docs.parquet")
    # 30 disjoint near-dup pairs: (g, 100+g) share a unique vocabulary,
    # no tokens shared across groups
    rows = []
    for g in range(30):
        text = " ".join(f"tok{g}w{j}" for j in range(12))
        rows.append((g, text, "en"))
        rows.append((100 + g, text + f" extra{g}", "en"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--skip-neardup",
        "--splits", "train=0.8,test=0.2",
    ])
    got = spark.read.parquet(f"{out}/documents.parquet").collect()
    by_id = {r["doc_id"]: r["split"] for r in got}
    assert counters["split_train"] + counters["split_test"] == len(got) == 60
    # leakage-safety: each near-dup pair shares a split (30 components)
    for g in range(30):
        assert by_id[g] == by_id[100 + g], g
    # exact replay: component label = min id of the pair = g
    for g in range(30):
        h = int(hashlib.md5(f"{g}|42".encode()).hexdigest()[:8], 16)
        want = "train" if h / float(1 << 32) < 0.8 else "test"
        assert by_id[g] == want, g
    assert len(set(by_id.values())) == 2  # both splits used at 30 groups


def test_prep_training_data_semdedup(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    emb_src = str(tmp_path / "emb.parquet")
    # 20 docs with distinct vocabularies (no minhash/exact dups), of
    # which ids 0/1 and 2/3 are SEMANTIC duplicates (near-identical
    # embeddings); ids 16..19 have no embedding at all
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12)), "en")
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    import numpy as np

    rng = np.random.RandomState(3)
    V = rng.randn(16, 8)
    V[1] = V[0] + 0.01 * rng.randn(8)
    V[3] = V[2] + 0.01 * rng.randn(8)
    spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(16)],
        "doc_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(emb_src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--skip-neardup",
        "--semdedup-embeddings", emb_src,
        "--semdedup-cells", "4",
        "--semdedup-min-cosine", "0.99",
    ])
    # two semantic-dup groups lose one member each; un-embedded docs
    # (16..19) pass through untouched
    assert counters["after_semdedup"] == 18
    got = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert {16, 17, 18, 19} <= got
    assert len(got & {0, 1}) == 1 and len(got & {2, 3}) == 1


def test_prep_training_data_dsir(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    tgt_src = str(tmp_path / "target.parquet")
    # raw: 20 target-like docs (shared vocab with target) + 20 unlike
    a_words = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(20):
        # uniq token keeps the 20 texts distinct through exact dedup
        text = " ".join(a_words[(i + j) % 4] for j in range(8))
        rows.append((i, f"{text} uniq{i}", "en"))
    for i in range(20, 40):
        rows.append((i, " ".join(f"junk{i}t{j}" for j in range(8)), "en"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1000 + i, " ".join(a_words[(i + j) % 4] for j in range(6)))
         for i in range(10)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(tgt_src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--min-tokens", "1",
        "--skip-neardup",
        "--dsir-target", tgt_src,
        "--dsir-k", "12",
        "--dsir-buckets", "200",
    ])
    assert counters["after_dsir_select"] == 12
    got = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/documents.parquet").collect()}
    # selection is dominated by target-like docs
    assert len(got) == 12
    assert sum(1 for d in got if d < 20) >= 10
    # --dsir-target without --dsir-k is a usage error
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        prep_main([
            "--input", src, "--output", str(tmp_path / "c2"),
            "--id-col", "doc_id", "--skip-neardup",
            "--dsir-target", tgt_src,
        ])


def test_prep_training_data_bigram_perplexity_filter(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    common = "the cat sat on the mat and the dog sat on the rug"
    scrambled = "mat the and sat dog the cat rug on the sat on the"
    rows = [(i, common + f" v{i}", "en") for i in range(6)] + [
        (20, scrambled, "en")  # same unigrams, broken word order
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    base = [
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
    ]
    from mismo_spark.textqa.lm import bigram_perplexity, unigram_perplexity

    docs = spark.read.parquet(src).withColumn("record_id", F.col("doc_id"))
    uni = {r["doc_id"]: r["perplexity"]
           for r in unigram_perplexity(docs).collect()}
    big = {r["doc_id"]: r["perplexity"]
           for r in bigram_perplexity(docs).collect()}
    # order-2 separates the scrambled doc far better than order-1
    assert big[20] / big[0] > uni[20] / uni[0]
    thr = (big[0] + big[20]) / 2
    counters = prep_main(base + [
        "--max-perplexity", str(thr), "--perplexity-order", "2",
    ])
    assert counters["after_perplexity_filter"] == 6
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert 20 not in kept


def test_prep_training_data_semdedup_duplicate_embedding_rows(spark, tmp_path):
    """Regression: duplicate rows per id in the embeddings table must
    not delete documents that have no semantic duplicate."""
    src = str(tmp_path / "docs.parquet")
    emb_src = str(tmp_path / "emb.parquet")
    rows = [(i, " ".join(f"q{i}z{j}" for j in range(10)), "en")
            for i in range(8)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    import numpy as np

    rng = np.random.RandomState(4)
    V = rng.randn(8, 6)
    emb_rows = [(i, [float(x) for x in V[i]]) for i in range(8)]
    # every id appears TWICE (identical vector — a re-run artifact)
    spark.createDataFrame(
        emb_rows + emb_rows, "doc_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(emb_src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
        "--semdedup-embeddings", emb_src,
        "--semdedup-cells", "2",
        "--semdedup-min-cosine", "0.999",
    ])
    # no planted semantic dups -> nothing may be dropped
    assert counters["after_semdedup"] == 8


def test_prep_training_data_layout_stages(spark, tmp_path):
    """Temperature mix + chunking + packing compose at the funnel tail."""
    src = str(tmp_path / "docs.parquet")
    rows = []
    i = 0
    for lang, n in (("en", 30), ("de", 6)):
        for _ in range(n):
            rows.append((i, " ".join(f"w{i}t{j}" for j in range(25)), lang))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
        "--temperature-alpha", "0.5", "--temperature-total", "20",
        "--chunk-tokens", "10", "--chunk-overlap", "2",
        "--pack-tokens", "30",
    ])
    assert counters["after_temperature_mix"] == 20
    got = spark.read.parquet(f"{out}/documents.parquet")
    cols = got.columns
    assert {"doc_id", "chunk_id", "start_token", "n_tokens",
            "seq_id", "seq_offset", "lang", "text"} <= set(cols)
    rows_out = got.collect()
    # 25-token docs at (10, overlap 2): 1 + ceil((25-10)/8) = 3 chunks
    assert counters["output_chunks"] == 20 * 3 == len(rows_out)
    # flattened mix keeps all 6 de docs plus 14 en
    langs = {}
    for r in rows_out:
        langs.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(langs["de"]) == 6 and len(langs["en"]) == 14
    # every chunk fits its sequence budget marker
    assert all(r["seq_offset"] < 30 for r in rows_out)
    assert counters["n_sequences"] >= 1
    # flag pairing is validated
    import pytest as _p
    with _p.raises(SystemExit):
        prep_main([
            "--input", src, "--output", str(tmp_path / "c2"),
            "--id-col", "doc_id", "--skip-neardup",
            "--temperature-alpha", "0.5",
        ])


def test_prep_training_data_history_dedup(spark, tmp_path):
    """Cross-snapshot dedup: docs whose normalized text fingerprint is
    in the history parquet drop; the Bloom prescreen exempts definite
    misses from the exact join (candidate counter < corpus size)."""
    from mismo_spark.textqa import fingerprint_hex

    src = str(tmp_path / "docs.parquet")
    hist_src = str(tmp_path / "history.parquet")
    rows = [(i, " ".join(f"h{i}w{j}" for j in range(8)), "en")
            for i in range(12)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    # history = fingerprints of docs 0..3 (plus an unrelated one)
    hist = spark.createDataFrame(
        [(r[1],) for r in rows[:4]] + [("something never seen",)],
        "text string",
    ).select(fingerprint_hex(F.col("text")).alias("fp"))
    hist.write.mode("overwrite").parquet(hist_src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
        "--history-fingerprints", hist_src,
    ])
    assert counters["after_history_dedup"] == 8
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert kept == set(range(4, 12))
    # the bloom prescreen sent at most a handful to the exact join
    assert 4 <= counters["history_bloom_candidates"] <= 12


def test_prep_training_data_perplexity_keep_frac(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    en = "the cat sat on the mat and the dog sat on the rug"
    de = "der hund sitzt auf der matte und die katze auf dem teppich"
    # texts unique per doc so the exact-dedupe stage keeps all of them
    rows = (
        [(i, en + f" extra{i}", "en") for i in range(6)]
        + [(10 + i, f"zyx{i} qwv jkl pqr mno abc def ghi stu", "en") for i in range(2)]
        + [(20 + i, de + f" mehr{i}", "de") for i in range(6)]
        + [(30 + i, f"qqq{i} www eee rrr ttt zzz uuu iii ooo", "de") for i in range(2)]
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup",
        "--perplexity-keep-frac", "0.75",
    ])
    assert counters["after_perplexity_keep_frac"] == 12
    kept = spark.read.parquet(f"{out}/documents.parquet")
    ids = {r["doc_id"] for r in kept.collect()}
    # gibberish (the worst quarter of each language) dropped, per lang
    assert ids.isdisjoint({10, 11, 30, 31})
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en", "de"}

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="keep-frac"):
        prep_main([
            "--input", src, "--output", str(tmp_path / "x"),
            "--id-col", "doc_id", "--skip-neardup",
            "--perplexity-keep-frac", "1.5",
        ])


def test_prep_training_data_gopher_repetition(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    clean = (
        "The committee reviewed seventeen separate proposals during the "
        "morning session and assigned each one to a different working "
        "group for detailed evaluation before the final vote next week."
    )
    rows = [(1, clean, "en"), (2, "spam offer " * 60, "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src, "--output", out, "--id-col", "doc_id",
        "--min-tokens", "1", "--skip-neardup", "--gopher-repetition",
    ])
    assert counters["after_gopher_repetition"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out}/documents.parquet").collect()}
    assert kept == {1}


def test_link_graph_job_pagerank_and_degrees(spark, tmp_path):
    """link_graph job: pages -> outlink edges -> ranks; Σ rank = 1, and
    a --seeds table switches to the TrustRank variant (seed pages rank
    above their uniform-teleport selves)."""
    from jobs.link_graph import main as graph_main

    src = str(tmp_path / "pages.parquet")
    rows = [
        ("u1", '<a href="u2">x</a><a href="u3">y</a>'),
        ("u2", '<a href="u3">z</a>'),
        ("u3", '<a href="u1">w</a><a href="u4">v</a>'),
        ("u4", "no links here"),  # dangling
    ]
    spark.createDataFrame(rows, "url string, html string").write.mode(
        "overwrite"
    ).parquet(src)

    out = str(tmp_path / "ranks.parquet")
    graph_main(["--input", src, "--output", out, "--n-iter", "6"])
    ranks = {r["node"]: r["rank"] for r in spark.read.parquet(out).collect()}
    assert set(ranks) == {"u1", "u2", "u3", "u4"}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)

    seeds_p = str(tmp_path / "seeds.parquet")
    spark.createDataFrame(
        [("u4", 1.0)], "node string, weight double"
    ).write.mode("overwrite").parquet(seeds_p)
    out_t = str(tmp_path / "trust.parquet")
    graph_main([
        "--input", src, "--output", out_t, "--n-iter", "6",
        "--seeds", seeds_p,
    ])
    trust = {r["node"]: r["rank"] for r in spark.read.parquet(out_t).collect()}
    assert sum(trust.values()) == pytest.approx(1.0, abs=1e-9)
    assert trust["u4"] > ranks["u4"]

    out_d = str(tmp_path / "deg.parquet")
    graph_main(["--input", src, "--output", out_d, "--mode", "degrees"])
    deg = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in spark.read.parquet(out_d).collect()
    }
    assert deg["u3"] == (2, 2) and deg["u4"] == (0, 1)


def test_link_graph_job_hits_and_host_contraction(spark, tmp_path):
    from jobs.link_graph import main as graph_main

    src = str(tmp_path / "pages2.parquet")
    rows = [
        ("https://a.com/1", '<a href="https://b.com/x">x</a><a href="https://b.com/y">y</a>'),
        ("https://a.com/2", '<a href="https://b.com/x">x</a>'),
        ("https://b.com/x", '<a href="https://a.com/1">back</a>'),
    ]
    spark.createDataFrame(rows, "url string, html string").write.mode(
        "overwrite"
    ).parquet(src)

    out_h = str(tmp_path / "hits.parquet")
    graph_main(["--input", src, "--output", out_h, "--mode", "hits", "--n-iter", "4"])
    hits_rows = {r["node"]: r for r in spark.read.parquet(out_h).collect()}
    assert set(spark.read.parquet(out_h).columns) == {"node", "hub", "authority"}
    assert sum(r["hub"] for r in hits_rows.values()) == pytest.approx(1.0, abs=1e-9)

    out_c = str(tmp_path / "hostrank.parquet")
    graph_main([
        "--input", src, "--output", out_c, "--contract-hosts", "--n-iter", "4",
    ])
    ranks = {r["node"]: r["rank"] for r in spark.read.parquet(out_c).collect()}
    # host graph: a.com -> b.com (weight 3), b.com -> a.com (weight 1)
    assert set(ranks) == {"a.com", "b.com"}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_link_graph_job_reciprocity_mode(spark, tmp_path):
    from jobs.link_graph import main as graph_main

    src = str(tmp_path / "pages3.parquet")
    rows = [
        ("u1", '<a href="u2">x</a>'),
        ("u2", '<a href="u1">y</a><a href="u3">z</a>'),
        ("u3", "no links"),
    ]
    spark.createDataFrame(rows, "url string, html string").write.mode(
        "overwrite"
    ).parquet(src)
    out = str(tmp_path / "recip.parquet")
    graph_main(["--input", src, "--output", out, "--mode", "reciprocity"])
    got = {
        r["node"]: (r["n_out"], r["n_reciprocal"], r["reciprocity"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {"u1": (1, 1, 1.0), "u2": (2, 1, 0.5)}


def test_cluster_qa_job_repairs_welded_cluster(spark, tmp_path, capsys):
    """cluster_qa job: two triangles welded by one support-0 bridge ->
    bridge flagged (support 0, LPA split), removed, component count
    goes 1 -> 2; repaired assignment == from-scratch CC without it."""
    import json as _json

    from jobs.cluster_qa import main as qa_main
    from mismo_spark.cluster.cc import connected_components

    links = [
        (1, 2), (2, 3), (1, 3),
        (5, 6), (6, 7), (5, 7),
        (3, 5),  # the weld
        (10, 11),  # untouched component
    ]
    ldf = spark.createDataFrame(
        links, "record_id_l long, record_id_r long"
    )
    in_path = str(tmp_path / "links.parquet")
    out = str(tmp_path / "qa")
    ldf.write.parquet(in_path)

    qa_main(["--links", in_path, "--output", out])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["bridges_removed"] == 1
    assert summary["components_before"] == 2
    assert summary["components_after"] == 3

    bridges = spark.read.parquet(f"{out}/bridges.parquet").collect()
    assert [(b.record_id_l, b.record_id_r) for b in bridges] == [(3, 5)]
    assert bridges[0].support == 0 and bridges[0].lpa_split

    repaired = {
        (r.record_id, r.component)
        for r in spark.read.parquet(f"{out}/assignment.parquet").collect()
    }
    scratch = {
        (r.record_id, r.component)
        for r in connected_components(
            ldf.filter(
                ~((F.col("record_id_l") == 3) & (F.col("record_id_r") == 5))
            )
        ).collect()
    }
    assert repaired == scratch


def test_cluster_qa_job_pivot_splitter(spark, tmp_path, capsys):
    """Same welded two-triangle graph through --splitter pivot: the
    KwikCluster labels disagree across the bridge too, so the repair
    is identical to the LPA path."""
    import json as _json

    from jobs.cluster_qa import main as qa_main

    links = [
        (1, 2), (2, 3), (1, 3),
        (5, 6), (6, 7), (5, 7),
        (3, 5),
        (10, 11),
    ]
    ldf = spark.createDataFrame(
        links, "record_id_l long, record_id_r long"
    )
    in_path = str(tmp_path / "links_pivot.parquet")
    out = str(tmp_path / "qa_pivot")
    ldf.write.parquet(in_path)

    qa_main(["--links", in_path, "--output", out, "--splitter", "pivot"])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["bridges_removed"] == 1
    assert summary["components_before"] == 2
    assert summary["components_after"] == 3
    bridges = spark.read.parquet(f"{out}/bridges.parquet").collect()
    assert [(b.record_id_l, b.record_id_r) for b in bridges] == [(3, 5)]


def test_cluster_qa_job_dry_run_keeps_assignment(spark, tmp_path, capsys):
    import json as _json

    from jobs.cluster_qa import main as qa_main

    ldf = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 5), (5, 6), (6, 7), (5, 7)],
        "record_id_l long, record_id_r long",
    )
    in_path = str(tmp_path / "links2.parquet")
    out = str(tmp_path / "qa2")
    ldf.write.parquet(in_path)
    qa_main(["--links", in_path, "--output", out, "--dry-run"])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["bridges_removed"] == 0
    assert summary["components_before"] == summary["components_after"] == 1
