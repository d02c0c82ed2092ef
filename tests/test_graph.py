"""Link-graph operators: outlink extraction, degrees, PageRank.

PageRank goldens are checked against an independent driver-side numpy
power iteration (same recurrence, dense matrix) — not against the Spark
plan itself — and the mass-conservation invariant Σrank = 1 is asserted
per graph.  The DuckDB unrolled-SQL oracle is exercised end-to-end by
the ``pagerank`` row in tests/test_oracles.py.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mismo_spark.graph import (
    degrees,
    extract_anchors,
    extract_outlinks,
    hits,
    host_graph,
    pagerank,
    reciprocity,
    top_anchor_texts,
)


def _numpy_pagerank(edges, n_iter, damping, teleport=None):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in set(edges):
        out_deg[idx[s]] += 1
    if teleport is None:
        t = np.full(n, 1.0 / n)
    else:
        t = np.zeros(n)
        for v, w in teleport.items():
            if v in idx:
                t[idx[v]] += w
        t /= t.sum()
    r = t.copy()
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, d in set(edges):
            contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) * t + damping * (contrib + dangling * t)
    return {v: r[idx[v]] for v in nodes}


GRAPHS = {
    # classic 4-node example with a dangling node (d has no out-edges)
    "dangling": [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")],
    "cycle": [("x", "y"), ("y", "z"), ("z", "x")],
    "star_in": [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_power_iteration(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    want = _numpy_pagerank(edges, n_iter=8, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dedupes_multi_edges(spark):
    # duplicated edge must not double-count contribution
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    want = _numpy_pagerank([("a", "b"), ("b", "a")], n_iter=4, damping=0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_personalized_pagerank_matches_power_iteration(spark):
    """TrustRank variant: teleport restricted to seeds, off-graph seed
    ignored, duplicate seed rows sum, Σ rank still 1."""
    edges = GRAPHS["dangling"]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("c", 3.0), ("zzz-not-in-graph", 9.0)],
        "node string, weight double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=8, teleport=seeds).collect()
    }
    want = _numpy_pagerank(edges, n_iter=8, damping=0.85, teleport={"a": 2.0, "c": 3.0})
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_rejects_empty_seed_overlap(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("nope", 1.0)], "node string, weight double")
    with pytest.raises(ValueError, match="teleport"):
        pagerank(df, teleport=seeds)


def test_pagerank_validates_params(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_degrees(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(df).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_extract_outlinks_binary_html(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a.com/1",
                bytearray(
                    b'<html><a href="http://b.com/x">x</a>'
                    b'<a href="http://c.com/y#frag">y</a>'
                    b'<a href="">empty</a></html>'
                ),
            ),
            ("http://a.com/2", bytearray(b"<html>no links</html>")),
        ],
        "url string, html binary",
    )
    got = extract_outlinks(pages).collect()
    pairs = {(r["url"], r["outlink"]) for r in got}
    # fragment stripped, empty href dropped, linkless page emits nothing
    assert pairs == {
        ("http://a.com/1", "http://b.com/x"),
        ("http://a.com/1", "http://c.com/y"),
    }


def _numpy_weighted_pagerank(wedges, n_iter, damping):
    """Power iteration over a {(s, d): w} weighted edge dict."""
    nodes = sorted({s for s, _ in wedges} | {d for _, d in wedges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    strength = np.zeros(n)
    for (s, _), w in wedges.items():
        strength[idx[s]] += w
    t = np.full(n, 1.0 / n)
    r = t.copy()
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for (s, d), w in wedges.items():
            contrib[idx[d]] += r[idx[s]] * w / strength[idx[s]]
        dangling = r[strength == 0].sum()
        r = (1 - damping) * t + damping * (contrib + dangling * t)
    return {v: r[idx[v]] for v in nodes}


def test_weighted_pagerank_matches_power_iteration(spark):
    """weight_column: neighbour gets rank*w/out_strength; duplicate
    (src, dst) rows sum their weights under dedupe_edges."""
    rows = [
        ("a", "b", 3.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("b", "c", 2.0),  # duplicate edge: weights sum to 4
        ("c", "d", 5.0),  # d dangling
    ]
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=8, weight_column="weight").collect()
    }
    want = _numpy_weighted_pagerank(
        {("a", "b"): 3.0, ("a", "c"): 1.0, ("b", "c"): 4.0, ("c", "d"): 5.0},
        n_iter=8,
        damping=0.85,
    )
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_equals_unweighted_on_unit_weights(spark):
    edges = GRAPHS["dangling"]
    df = spark.createDataFrame(edges, "src string, dst string").withColumn(
        "weight", F.lit(1.0)
    )
    plain = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    weighted = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=5, weight_column="weight").collect()
    }
    assert plain == weighted  # bit-identical: same float expression tree


def test_host_graph_contracts_pages_to_domains(spark):
    edges = spark.createDataFrame(
        [
            ("https://www.a.com/1", "https://b.com/x"),
            ("https://a.com/2", "http://sub.b.com/y"),
            ("https://a.com/3", "https://a.com/4"),  # self-loop dropped
            ("https://c.org/z", "https://a.com/1"),
        ],
        "src string, dst string",
    )
    got = {
        (r["src"], r["dst"]): r["weight"] for r in host_graph(edges).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("c.org", "a.com"): 1}
    with_loops = host_graph(edges, drop_self_loops=False)
    assert ("a.com", "a.com") in {
        (r["src"], r["dst"]) for r in with_loops.collect()
    }


def _numpy_hits(edges, n_iter):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    eset = set(edges)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for s, d in eset:
            a[idx[d]] += h[idx[s]]
        a /= a.sum()
        h2 = np.zeros(n)
        for s, d in eset:
            h2[idx[s]] += a[idx[d]]
        h = h2 / h2.sum()
    return (
        {v: h[idx[v]] for v in nodes},
        {v: a[idx[v]] for v in nodes},
    )


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_hits_matches_power_iteration(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = hits(df, n_iter=6).collect()
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["authority"] for r in rows}
    want_h, want_a = _numpy_hits(edges, n_iter=6)
    assert set(got_h) == set(want_h)
    for v in want_h:
        assert got_h[v] == pytest.approx(want_h[v], abs=1e-12)
        assert got_a[v] == pytest.approx(want_a[v], abs=1e-12)
    # L1-normalized: both score families sum to 1
    assert sum(got_h.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(got_a.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_star_separates_hub_from_authority(spark):
    """In an in-star, the spokes are pure hubs and the hub node the
    pure authority (plus the hub's own back-edge to s1)."""
    df = spark.createDataFrame(GRAPHS["star_in"], "src string, dst string")
    rows = {r["node"]: r for r in hits(df, n_iter=10).collect()}
    assert rows["hub"]["authority"] > rows["s1"]["authority"]
    assert rows["s2"]["hub"] > rows["hub"]["hub"]
    assert rows["s2"]["authority"] == 0.0  # never a link target
    with pytest.raises(ValueError):
        hits(df, n_iter=0)


def test_reciprocity(spark):
    """Farm nodes (mutual ring) score 1, organic one-way links 0;
    duplicates and self-loops don't inflate counts."""
    edges = [
        ("farm1", "farm2"), ("farm2", "farm1"),  # mutual pair
        ("farm1", "farm2"),                       # duplicate edge
        ("blog", "farm1"),                        # one-way
        ("blog", "news"),
        ("news", "news"),                         # self-loop ignored
        ("news", "blog"),                         # reciprocal with blog
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["n_out"], r["n_reciprocal"], r["reciprocity"])
        for r in reciprocity(df).collect()
    }
    assert got == {
        "farm1": (1, 1, 1.0),
        "farm2": (1, 1, 1.0),
        "blog": (2, 1, 0.5),
        "news": (1, 1, 1.0),
    }


def test_extract_outlinks_quote_forms(spark):
    """Real crawl HTML mixes double-quoted, single-quoted and unquoted
    attribute values; all three lex, fragments stripped in each."""
    pages = spark.createDataFrame(
        [
            (
                "p",
                "<a href='http://s.com/q#f'>sq</a>"
                "<a href=http://u.com/bare>uq</a>"
                '<a href = "http://d.com/x">spaced =</a>'
                "<a href=''>empty</a>",
            ),
        ],
        "url string, html string",
    )
    got = {r["outlink"] for r in extract_outlinks(pages).collect()}
    assert got == {"http://s.com/q", "http://u.com/bare", "http://d.com/x"}


def test_extract_anchors(spark):
    """Nested tags stripped, whitespace collapsed, fragment stripped,
    multiline anchors handled, href-less anchors dropped."""
    pages = spark.createDataFrame(
        [
            (
                "p1",
                '<a href="u1" class="x"><b>Bold</b>  text</a>'
                '<a href="u2#frag">two\n  lines</a>'
                "<a name='no-href'>skipped</a>"
                '<a href="">empty target</a>',
            ),
        ],
        "url string, html string",
    )
    got = {
        (r["url"], r["outlink"], r["anchor"])
        for r in extract_anchors(pages).collect()
    }
    assert got == {
        ("p1", "u1", "Bold text"),
        ("p1", "u2", "two lines"),
    }


def test_top_anchor_texts(spark):
    anchors = spark.createDataFrame(
        [
            ("a", "t1", "home"),
            ("b", "t1", "home"),
            ("c", "t1", "start"),
            ("d", "t1", "about"),
            ("e", "t1", ""),  # empty anchors never counted
            ("f", "t2", "solo"),
        ],
        "url string, outlink string, anchor string",
    )
    got = {
        (r["outlink"], r["anchor"]): (r["n_occurrences"], r["rank"])
        for r in top_anchor_texts(anchors, k=2).collect()
    }
    # count desc, then anchor asc on the 1-count tie: 'about' < 'start'
    assert got == {
        ("t1", "home"): (2, 1),
        ("t1", "about"): (1, 2),
        ("t2", "solo"): (1, 1),
    }
    with pytest.raises(ValueError):
        top_anchor_texts(anchors, k=0)


def test_pagerank_plan_has_no_cross_corpus_shuffle_growth(spark):
    """Lineage must stay O(1): the 8-round plan string must not embed 8
    nested join trees (localCheckpoint truncates each round)."""
    df = spark.createDataFrame(GRAPHS["dangling"], "src string, dst string")
    ranks = pagerank(df, n_iter=8)
    plan = ranks._jdf.queryExecution().toString()
    # a non-truncated plan would repeat the edge scan ~8x
    assert plan.count("LogicalRDD") >= 1
    assert plan.count("Join") <= 6


def test_extract_outlinks_unquoted_rejects_embedded_quote(spark):
    """Malformed `href=a"b>` must lex as `a`, not `a"b` — the unquoted
    branch excludes quote characters at every position."""
    pages = spark.createDataFrame(
        [("p", '<a href=http://u.com/a"b>x</a>')], "url string, html string"
    )
    got = {r["outlink"] for r in extract_outlinks(pages).collect()}
    assert got == {"http://u.com/a"}


def test_pagerank_durable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir (durable parquet per round) must give EXACTLY the
    ranks of the localCheckpoint path — same recurrence, different
    lineage cut (cc.py's resumable-variant discipline)."""
    edges = GRAPHS["dangling"]
    df = spark.createDataFrame(edges, "src string, dst string")
    base = {r["node"]: r["rank"] for r in pagerank(df, n_iter=6).collect()}
    durable = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, n_iter=6, checkpoint_dir=str(tmp_path / "pr")
        ).collect()
    }
    assert base == durable
    # the per-round parquet rounds exist on disk (resume material)
    assert (tmp_path / "pr" / "pagerank_round_5.parquet").exists()


def test_hits_durable_checkpoint_identical(spark, tmp_path):
    df = spark.createDataFrame(GRAPHS["star_in"], "src string, dst string")
    base = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, n_iter=4).collect()
    }
    durable = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, n_iter=4, checkpoint_dir=str(tmp_path / "h")).collect()
    }
    assert base == durable
    assert (tmp_path / "h" / "hits_hub_3.parquet").exists()


def test_pagerank_rejects_nonpositive_weights_rows(spark):
    """Zero/negative-weight rows are dropped (docstring contract) —
    they must not poison out_strength or break Σrank=1."""
    df = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 0.0), ("b", "a", -1.0), ("b", "a", 1.0)],
        "src string, dst string, weight double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5, weight_column="weight").collect()}
    want = _numpy_pagerank([("a", "b"), ("b", "a")], n_iter=5, damping=0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


class TestLinkPrediction:
    """Adamic–Adar / common-neighbor prediction over a hand-computed
    graph: edges 1-2, 1-3, 2-3, 2-4, 3-4.  Degrees 1:2, 2:3, 3:3, 4:2.
    The only non-adjacent pair sharing neighbors is (1, 4), via {2, 3}:
    cn=2, AA = 2/ln(3), jaccard = 2/(2+2-2) = 1.0."""

    EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]

    def _df(self, spark):
        return spark.createDataFrame(self.EDGES, "src long, dst long")

    def test_predicts_missing_pair(self, spark):
        from mismo_spark.graph import link_prediction

        out = link_prediction(self._df(spark)).collect()
        assert len(out) == 1
        row = out[0]
        assert (row.node_a, row.node_b) == (1, 4)
        assert row.common_neighbors == 2
        assert row.adamic_adar == pytest.approx(2.0 / np.log(3.0))
        assert row.jaccard == pytest.approx(1.0)

    def test_max_degree_cap_drops_hub_wedges(self, spark):
        from mismo_spark.graph import link_prediction

        # cap 2 removes nodes 2 and 3 (degree 3) as shared neighbors;
        # the only remaining wedge pair (2, 3) via shared 1 and 4 is an
        # existing edge, so nothing is predicted
        out = link_prediction(self._df(spark), max_degree=2).collect()
        assert out == []

    def test_direction_and_duplicates_ignored(self, spark):
        from mismo_spark.graph import link_prediction

        dup = self.EDGES + [(2, 1), (4, 3), (1, 2)]
        df = spark.createDataFrame(dup, "src long, dst long")
        out = link_prediction(df).collect()
        assert len(out) == 1 and out[0].common_neighbors == 2

    def test_min_common_filters(self, spark):
        from mismo_spark.graph import link_prediction

        out = link_prediction(self._df(spark), min_common=3).collect()
        assert out == []


class TestEdgeSupport:
    """Triangle support per edge: graph = triangle {1,2,3} + pendant
    3-4 + bridge 4-5 into triangle {5,6,7}."""

    EDGES = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5),
        (5, 6), (6, 7), (5, 7),
    ]

    def test_supports(self, spark):
        from mismo_spark.graph import edge_support

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            (r.node_a, r.node_b): r.support
            for r in edge_support(df).collect()
        }
        assert got == {
            (1, 2): 1, (2, 3): 1, (1, 3): 1,
            (3, 4): 0, (4, 5): 0,
            (5, 6): 1, (6, 7): 1, (5, 7): 1,
        }

    def test_every_edge_present_once(self, spark):
        from mismo_spark.graph import edge_support

        dup = self.EDGES + [(2, 1), (7, 5)]
        df = spark.createDataFrame(dup, "src long, dst long")
        out = edge_support(df)
        assert out.count() == len(self.EDGES)


class TestLocalClustering:
    """Triangle {1,2,3} + pendant 3-4: deg 1:2, 2:2, 3:3, 4:1.
    t(1)=t(2)=t(3)=1, t(4)=0. cc: 1→1.0, 2→1.0, 3→2/(3·2)=0.333…,
    4→0.0 (degree<2)."""

    def test_coefficients(self, spark):
        from mismo_spark.graph import local_clustering

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        got = {
            r.node: (r.degree, r.triangles, r.clustering)
            for r in local_clustering(df).collect()
        }
        assert got[1] == (2, 1, 1.0)
        assert got[2] == (2, 1, 1.0)
        assert got[3][0] == 3 and got[3][1] == 1
        assert got[3][2] == pytest.approx(1 / 3)
        assert got[4] == (1, 0, 0.0)

    def test_capped_hub_reports_null(self, spark):
        from mismo_spark.graph import local_clustering

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        got = {
            r.node: (r.triangles, r.clustering)
            for r in local_clustering(df, max_degree=2).collect()
        }
        assert got[3] == (None, None)  # degree 3 > cap: uncounted, not 0
        assert got[1] == (1, 1.0)  # its triangle wedge has apexes 1,2 intact


class TestLabelPropagation:
    """Two triangles {1,2,3} and {5,6,7} joined by bridge 3-5: LPA
    converges to label 1 on the left core and 5 on the right core —
    the split suggestion CC (one component) cannot give."""

    EDGES = [(1, 2), (2, 3), (1, 3), (3, 5), (5, 6), (6, 7), (5, 7)]

    def test_cores_get_distinct_labels(self, spark):
        from mismo_spark.graph import label_propagation

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r.node: r.label
            for r in label_propagation(df, n_iter=5).collect()
        }
        assert got[1] == got[2] == got[3]
        assert got[5] == got[6] == got[7]
        assert got[1] != got[5]

    def test_sync_sweep_deterministic(self, spark):
        from mismo_spark.graph import label_propagation

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        a = sorted(
            (r.node, r.label)
            for r in label_propagation(df, n_iter=3).collect()
        )
        b = sorted(
            (r.node, r.label)
            for r in label_propagation(
                df.repartition(7), n_iter=3
            ).collect()
        )
        assert a == b

    def test_matches_python_reference(self, spark):
        from mismo_spark.graph import label_propagation

        edges = self.EDGES + [(10, 11)]
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        lbl = {n: n for n in nbrs}
        for _ in range(4):
            new = {}
            for n, ns in nbrs.items():
                cnt = {}
                for m in list(ns) + [n]:  # self-vote, as in the engine
                    cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
                new[n] = min(cnt, key=lambda c: (-cnt[c], c))
            lbl = new
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.label
            for r in label_propagation(df, n_iter=4).collect()
        }
        assert got == lbl

    def test_checkpoint_dir_resume_identical(self, spark, tmp_path):
        from mismo_spark.graph import label_propagation

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        a = sorted(
            (r.node, r.label)
            for r in label_propagation(
                df, n_iter=3, checkpoint_dir=str(tmp_path / "lpa")
            ).collect()
        )
        b = sorted(
            (r.node, r.label)
            for r in label_propagation(df, n_iter=3).collect()
        )
        assert a == b


class TestCoreNumbers:
    """k-core via the h-index fixpoint vs a classic peel reference."""

    @staticmethod
    def peel_py(edges):
        """Batch peeling: repeatedly delete ALL nodes of degree < k."""
        nbrs = {}
        for u, v in edges:
            if u == v:
                continue
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        core, alive = {}, dict(nbrs)
        k = 1
        while alive:
            doomed = [n for n, ns in alive.items() if len(ns) < k]
            if not doomed:
                k += 1
                continue
            for n in doomed:
                core[n] = k - 1
                for m in alive[n]:
                    if m in alive:
                        alive[m].discard(n)
                del alive[n]
        return core

    def run(self, spark, edges, **kw):
        from mismo_spark.graph import core_numbers

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.core for r in core_numbers(df, **kw).collect()}

    def test_triangle_plus_pendant(self, spark):
        # triangle {1,2,3} is the 2-core; pendant 4 has coreness 1
        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = self.run(spark, edges)
        assert got == {1: 2, 2: 2, 3: 2, 4: 1}
        assert got == self.peel_py(edges)

    def test_clique_with_tail(self, spark):
        # K4 (coreness 3) with a 3-node path hanging off (coreness 1)
        k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
        edges = k4 + [(4, 10), (10, 11), (11, 12)]
        got = self.run(spark, edges)
        assert got == self.peel_py(edges)
        assert got[1] == 3 and got[10] == 1

    def test_randomized_equivalence(self, spark):
        import random

        rng = random.Random(17)
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(30), rng.randrange(30)) for _ in range(150)
                )
                if a != b
            }
        )
        assert self.run(spark, edges) == self.peel_py(edges)

    def test_duplicate_and_reversed_edges_ignored(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3)]
        assert self.run(spark, edges) == {1: 2, 2: 2, 3: 2}

    def test_checkpoint_dir_resume_identical(self, spark, tmp_path):
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        a = self.run(spark, edges)
        b = self.run(spark, edges, checkpoint_dir=str(tmp_path / "core"))
        assert a == b

    def test_oracle_sql_matches(self, spark):
        import duckdb

        from mismo_spark.graph import core_numbers_oracle_sql

        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
        got = self.run(spark, edges)
        vals = ", ".join(f"({u}, {v})" for u, v in edges)
        sql = core_numbers_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) t(src, dst)"
        )
        want = dict(duckdb.connect().execute(sql).fetchall())
        assert got == want
